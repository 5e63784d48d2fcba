"""Shift-aware temperature refitting (tools/refit_temperature.py).

The clean-fit temperature under-smooths under distribution shift (BENCH.md
"Calibration under shift"); the tool refits T on the held-out val split plus
leak-free AugMix views of it and can write a checkpoint copy whose
``temperature`` evaluate/serving pick up unchanged. These tests pin the
tool's contract: report shape, checkpoint round-trip with the clean-fit
value preserved, params untouched, and ensemble rejection."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.config import ModelParams
from fav_tpu.models.cnn import create_model
from fav_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

from tools.refit_temperature import main as refit_main

WIDTHS = (8, 16)


def _save_ckpt(tmp_path, name, extra_meta=None):
    model = create_model(ModelParams(widths=WIDTHS, dense_width=WIDTHS[-1]))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    meta = {"arch": "vgg", "widths": list(WIDTHS), "dense_width": WIDTHS[-1],
            "temperature": 1.0, **(extra_meta or {})}
    path = os.path.join(str(tmp_path), name)
    save_checkpoint(path, params, metadata=meta)
    return path, params


@pytest.mark.slow
def test_refit_reports_and_writes_checkpoint(tmp_path):
    src, params = _save_ckpt(tmp_path, "src")
    out = os.path.join(str(tmp_path), "refit")
    report = refit_main(["--checkpoint", src, "--views", "2", "--out", out])

    assert report["temperature_cleanfit"] > 0
    assert report["temperature_shiftfit"] > 0
    assert set(report["ece_clean_val"]) == {"cleanfit_T", "shiftfit_T"}
    assert set(report["ece_augmented_val"]) == {"cleanfit_T", "shiftfit_T"}

    with open(os.path.join(out, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["temperature"] == report["temperature_shiftfit"]
    assert meta["temperature_cleanfit"] == report["temperature_cleanfit"]
    assert meta["temperature_refit"]["views"] == 2

    # params pass through bit-exactly — only the metadata changes
    model = create_model(ModelParams(widths=WIDTHS, dense_width=WIDTHS[-1]))
    template = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), jnp.float32))
    restored, _ = restore_checkpoint(out, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored, params,
    )


@pytest.mark.slow
def test_refit_rejects_ensembles(tmp_path):
    src, _ = _save_ckpt(tmp_path, "ens", {"ensemble_size": 5})
    with pytest.raises(SystemExit):
        refit_main(["--checkpoint", src, "--views", "1"])
