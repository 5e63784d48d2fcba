"""Operator tooling (evidence replay, offline analysis)."""
