"""DeepAugment view generator + train step (fav_tpu/ops/deepaugment.py).

The weather-family remedy: learned-manifold distortions via the
perturbed-weights autoencoder (Hendrycks et al., ICCV 2021 recipe), leak-free
by construction — no corruption formula is touched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.config import ModelParams
from fav_tpu.models.cnn import create_autoencoder, create_model
from fav_tpu.ops.deepaugment import deepaugment, perturb_params


@pytest.fixture(scope="module")
def ae():
    model = create_autoencoder(ModelParams(compute_dtype="float32"))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    return model, params


@pytest.mark.slow
def test_perturb_params_strength_zero_is_identity(ae):
    _, params = ae
    out = perturb_params(jax.random.PRNGKey(1), params, jnp.float32(0.0))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


@pytest.mark.slow
def test_perturb_params_changes_weights_and_preserves_structure(ae):
    _, params = ae
    out = perturb_params(jax.random.PRNGKey(1), params, jnp.float32(0.4))
    la, lb = jax.tree.leaves(params), jax.tree.leaves(out)
    assert len(la) == len(lb)
    changed = sum(
        float(np.mean(np.asarray(a) != np.asarray(b))) for a, b in zip(la, lb)
    )
    assert changed > 0.5  # most float leaves perturbed
    for a, b in zip(la, lb):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.slow
def test_deepaugment_view_in_range_and_stochastic(ae):
    model, params = ae
    x = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3), jnp.float32), 0, 1
    )
    v1 = deepaugment(jax.random.PRNGKey(4), x, model.apply, params)
    v2 = deepaugment(jax.random.PRNGKey(5), x, model.apply, params)
    assert v1.shape == x.shape and v1.dtype == x.dtype
    assert float(v1.min()) >= 0.0 and float(v1.max()) <= 1.0
    assert float(jnp.mean(jnp.abs(v1 - x))) > 1e-3  # actually distorts
    assert float(jnp.mean(jnp.abs(v1 - v2))) > 1e-4  # per-key stochastic
    # reproducible under the same key
    v1b = deepaugment(jax.random.PRNGKey(4), x, model.apply, params)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v1b), atol=0)


@pytest.mark.slow
def test_deepaugment_train_step_runs_and_learns(ae):
    from fav_tpu.models.train import TrainState, deepaugment_train_step

    import optax

    ae_model, ae_params = ae
    model = create_model(ModelParams(widths=(8, 16), dense_width=16,
                                     compute_dtype="float32"))
    x = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(7), (16, 32, 32, 3), jnp.float32), 0, 1
    )
    y = jnp.arange(16, dtype=jnp.int32) % 10
    params = model.init(jax.random.PRNGKey(0), x[:1])
    tx = optax.adamw(1e-3)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    lam = jnp.float32(12.0)
    losses = []
    key = jax.random.PRNGKey(11)
    for _ in range(6):
        key, k = jax.random.split(key)
        state, metrics = deepaugment_train_step(
            model.apply, ae_model.apply, tx, state, x, y, k, lam, ae_params
        )
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 6
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizing 16 images must reduce loss


@pytest.mark.slow
def test_deepaugment_megastep_matches_per_step(ae):
    """The widened megastep's DeepAugment branch (AE params baked at
    factory time) reproduces the per-step deepaugment_train_step chain."""
    import optax

    from fav_tpu.models.train import (
        TrainState,
        deepaugment_train_step,
        make_train_megastep,
    )

    ae_model, ae_params = ae
    model = create_model(ModelParams(widths=(8, 16), dense_width=16,
                                     compute_dtype="float32"))
    images = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(7), (32, 32, 32, 3), jnp.float32), 0, 1
    )
    labels = jnp.arange(32, dtype=jnp.int32) % 10
    params = model.init(jax.random.PRNGKey(0), images[:1])
    tx = optax.adamw(1e-3)
    lam = jnp.float32(12.0)
    idx = np.stack([np.arange(16), np.arange(16, 32), np.arange(16)]).astype(np.int32)

    state = TrainState(jax.tree.map(jnp.copy, params), tx.init(params),
                       jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(11)
    for row in idx:
        key, step_key = jax.random.split(key)
        state, _ = deepaugment_train_step(
            model.apply, ae_model.apply, tx, state,
            images[row], labels[row], step_key, lam, ae_params,
        )

    mega = make_train_megastep(
        model.apply, tx, augmix=True, js_lam=12.0,
        deepaugment=True, ae_apply=ae_model.apply, ae_params=ae_params,
    )
    state2 = TrainState(jax.tree.map(jnp.copy, params), tx.init(params),
                        jnp.zeros((), jnp.int32))
    state2, key2, metrics = mega(
        state2, images, labels, jnp.asarray(idx), jax.random.PRNGKey(11)
    )
    np.testing.assert_array_equal(np.asarray(key), np.asarray(key2))
    assert int(state2.step) == 3 and np.isfinite(float(metrics["loss"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-2, rtol=0),
        state.params, state2.params,
    )


def test_cli_deepaugment_requires_single_model():
    from fav_tpu.models.pretrain import main

    with pytest.raises(SystemExit):
        main(["--deepaugment", "--ensemble", "2", "--steps", "1"])


def test_cli_augmix_ce_requires_ensemble():
    from fav_tpu.models.pretrain import main

    with pytest.raises(SystemExit):
        main(["--augmix-ce", "--steps", "1"])
