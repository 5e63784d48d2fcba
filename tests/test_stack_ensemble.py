"""Heterogeneous-recipe ensemble stacking (tools/stack_ensemble.py).

The tool turns N independently trained same-architecture checkpoints into
one ensemble-format checkpoint (leaf-wise (M, ...) stack + logit-averaged
temperature/conformal calibration) that `evaluate --ensemble M` and the
serving path consume unchanged. Mirrors the reference's absent-but-specced
ML strategy of combining models for decision support (SURVEY.md §2.4) the
ensemble way."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.config import ModelParams
from fav_tpu.models.cnn import create_model
from fav_tpu.models.uncertainty import init_ensemble
from fav_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

from tools.stack_ensemble import main as stack_main

WIDTHS = (8, 16)


def _save_member(tmp_path, name, seed, extra_meta=None):
    model = create_model(ModelParams(widths=WIDTHS, dense_width=WIDTHS[-1]))
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3), jnp.float32))
    meta = {"arch": "vgg", "widths": list(WIDTHS), "dense_width": WIDTHS[-1],
            "train_steps": 1, **(extra_meta or {})}
    path = os.path.join(str(tmp_path), name)
    save_checkpoint(path, params, metadata=meta)
    return path, params


@pytest.mark.slow
def test_stack_ensemble_roundtrip(tmp_path):
    a_path, a_params = _save_member(tmp_path, "a", 0, {"augmix": True})
    b_path, b_params = _save_member(tmp_path, "b", 1, {"occlude": True})
    out = os.path.join(str(tmp_path), "stacked")
    meta = stack_main([a_path, b_path, "--out", out])

    assert meta["ensemble_size"] == 2
    assert meta["member_recipes"][0].get("augmix") and meta["member_recipes"][1].get("occlude")
    assert meta["temperature"] > 0 and "conformal_qhat" in meta

    # the written checkpoint restores through the SAME template evaluate
    # --ensemble uses, and each member slice round-trips bit-exactly
    model = create_model(ModelParams(widths=WIDTHS, dense_width=WIDTHS[-1]))
    template = init_ensemble(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32), 2
    )
    stacked, meta2 = restore_checkpoint(out, template)
    assert meta2["ensemble_size"] == 2
    for i, member in enumerate((a_params, b_params)):
        jax.tree.map(
            lambda s, m, i=i: np.testing.assert_array_equal(np.asarray(s)[i], np.asarray(m)),
            stacked, member,
        )


@pytest.mark.slow
def test_stack_ensemble_rejects_arch_mismatch(tmp_path):
    a_path, _ = _save_member(tmp_path, "a", 0)
    # different dense width = different architecture
    model = create_model(ModelParams(widths=(8, 8), dense_width=8))
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3), jnp.float32))
    b_path = os.path.join(str(tmp_path), "b")
    save_checkpoint(b_path, params, metadata={"arch": "vgg", "widths": [8, 8], "dense_width": 8})
    with pytest.raises(SystemExit):
        stack_main([a_path, b_path, "--out", os.path.join(str(tmp_path), "x")])
