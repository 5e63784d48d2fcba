"""Distillation path tests: the KD megastep (device-resident K-step scan)
must reproduce the per-step distill_ensemble loop (shared _kd_step_core +
index_iterator shuffle stream), tolerating only XLA compilation-level fp
reassociation (see tests/test_models.py::test_megastep_matches_per_step_loop
for the calibration of the tolerances)."""

import jax
import numpy as np
import pytest

from fav_tpu.config import ModelParams
from fav_tpu.data.cifar import synthetic_cifar10
from fav_tpu.models.cnn import create_model
from fav_tpu.models.distill import distill_ensemble
from fav_tpu.models.uncertainty import init_ensemble

import jax.numpy as jnp


@pytest.fixture(scope="module")
def kd_setup():
    ds = synthetic_cifar10(train_size=64, test_size=8, seed=11)
    teacher_mp = ModelParams(widths=(16, 32), dense_width=32, ensemble_size=2)
    teacher = create_model(teacher_mp)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    stacked = init_ensemble(teacher, jax.random.PRNGKey(0), sample, 2)
    student_mp = ModelParams(widths=(8, 16), dense_width=16)
    student = create_model(student_mp)
    return ds, teacher, stacked, student


@pytest.mark.parametrize(
    "augmix", [False, pytest.param(True, marks=pytest.mark.slow)]
)
@pytest.mark.slow
def test_kd_megastep_matches_per_step(kd_setup, augmix):
    ds, teacher, stacked, student = kd_setup
    kwargs = dict(
        num_steps=5, batch_size=16, learning_rate=1e-3, seed=2, augmix=augmix
    )
    # 5 steps = 1 chunk of 2 + 1 chunk of 2 + 1 per-step tail
    p_loop = distill_ensemble(
        student, teacher.apply, stacked, ds.train_images, ds.train_labels, **kwargs
    )
    p_mega = distill_ensemble(
        student, teacher.apply, stacked, ds.train_images, ds.train_labels,
        megastep=2, **kwargs
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-2, rtol=0),
        p_loop, p_mega,
    )


@pytest.mark.slow
def test_kd_step_bf16_aug_tracks_f32():
    """The KD step with the bf16 AugMix chain (bf16_aug=True) must train the
    same objective: same-key losses within a small relative band of the f32
    path (the augmented half differs only by bf16 rounding, ~3e-3 mean)."""
    import optax

    from fav_tpu.models.distill import make_kd_step

    ds = synthetic_cifar10(train_size=32, test_size=8, seed=13)
    teacher_mp = ModelParams(widths=(16, 32), dense_width=32, ensemble_size=2)
    teacher = create_model(teacher_mp)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    stacked = init_ensemble(teacher, jax.random.PRNGKey(0), sample, 2)
    student_mp = ModelParams(widths=(8, 16), dense_width=16)
    student_model = create_model(student_mp)
    student = student_model.init(jax.random.PRNGKey(3), sample)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(student)

    x = jnp.asarray(ds.train_images[:16])
    y = jnp.asarray(ds.train_labels[:16])
    key = jax.random.PRNGKey(7)
    losses = {}
    for name, bf in (("f32", False), ("bf16", True)):
        step = make_kd_step(
            student_model.apply, teacher.apply, tx, 2.0, 0.3,
            augmix=True, bf16_aug=bf,
        )
        _, _, loss = step(student, opt_state, stacked, x, y, key)
        losses[name] = float(loss)
        assert np.isfinite(losses[name])
    assert abs(losses["bf16"] - losses["f32"]) < 0.05 * abs(losses["f32"]) + 1e-3
