"""Tests for fav_tpu.models: CNN/AE forwards, uncertainty, training smoke.

Mirrors the reference's verified-behavior methodology (reference
docs/system_notes.md:199-229) with actual assertions: the model must learn,
uncertainty must rise under corruption, and the AE must reproduce the
documented BLANK blind spot (anomaly stays low on black frames,
reference anomaly_simulator.py:65-70).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.config import ModelParams
from fav_tpu.data.cifar import synthetic_cifar10, batch_iterator, load_cifar10
from fav_tpu.models.cnn import FailureAwareCNN, ConvAutoencoder, create_model
from fav_tpu.models.train import (
    create_train_state,
    classifier_train_step,
    classifier_eval_step,
    autoencoder_train_step,
    make_ensemble_train_step,
    train_classifier,
)
from fav_tpu.models.uncertainty import (
    max_softmax_probability,
    predictive_entropy,
    mutual_information,
    mc_dropout_predict,
    ensemble_predict,
    init_ensemble,
    anomaly_from_confidence,
)

SMALL = ModelParams(widths=(16, 32), dense_width=32, mc_samples=4, ensemble_size=3)


@pytest.fixture(scope="module")
def small_model():
    return create_model(SMALL)


@pytest.fixture(scope="module")
def small_params(small_model):
    return small_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


def test_cnn_forward_shape_and_dtype(small_model, small_params):
    x = jnp.zeros((4, 32, 32, 3))
    logits = jax.jit(small_model.apply)(small_params, x)
    assert logits.shape == (4, 10)
    assert logits.dtype == jnp.float32  # head forced to f32 for calibration math


@pytest.mark.slow
def test_cnn_dropout_purity(small_model, small_params):
    """Same key -> same output; different keys -> different outputs (train mode)."""
    x = jnp.ones((2, 32, 32, 3)) * 0.5
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    a = small_model.apply(small_params, x, train=True, rngs={"dropout": k1})
    b = small_model.apply(small_params, x, train=True, rngs={"dropout": k1})
    c = small_model.apply(small_params, x, train=True, rngs={"dropout": k2})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_autoencoder_roundtrip_shape():
    ae = ConvAutoencoder(widths=(8, 16), latent=16)
    params = ae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32, 3))
    recon = jax.jit(ae.apply)(params, x)
    assert recon.shape == x.shape
    err = ConvAutoencoder.reconstruction_error(recon, x)
    assert err.shape == (3,)
    assert bool(jnp.all(err >= 0))


def test_uncertainty_scalars():
    logits = jnp.array([[4.0, 0.0, 0.0], [0.1, 0.1, 0.1]])
    msp = max_softmax_probability(logits)
    assert msp[0] > 0.9 and abs(float(msp[1]) - 1 / 3) < 1e-6
    probs = jax.nn.softmax(logits, -1)
    ent = predictive_entropy(probs)
    assert float(ent[1]) == pytest.approx(np.log(3), abs=1e-6)
    assert float(ent[0]) < float(ent[1])


def test_mutual_information_disagreement():
    agree = jnp.stack([jnp.array([[0.9, 0.05, 0.05]])] * 4)
    disagree = jnp.stack(
        [jnp.array([[0.9, 0.05, 0.05]]), jnp.array([[0.05, 0.9, 0.05]])] * 2
    )
    assert float(mutual_information(disagree)[0]) > float(mutual_information(agree)[0]) + 0.1


@pytest.mark.slow
def test_mc_dropout_predict(small_model, small_params):
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3))
    out = mc_dropout_predict(
        small_model.apply, small_params, x, jax.random.PRNGKey(0), num_samples=4
    )
    assert out["member_probs"].shape == (4, 2, 10)
    np.testing.assert_allclose(np.asarray(out["probs"].sum(-1)), 1.0, rtol=1e-5)
    # replicas must actually differ (dropout active)
    mp = np.asarray(out["member_probs"])
    assert not np.allclose(mp[0], mp[1])
    assert bool(jnp.all(out["mutual_information"] >= -1e-6))


@pytest.mark.slow
def test_ensemble_init_and_predict(small_model):
    stacked = init_ensemble(small_model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), 3)
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[0] == 3
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = ensemble_predict(small_model.apply, stacked, x)
    assert out["member_probs"].shape == (3, 2, 10)
    assert out["prediction"].shape == (2,)
    # independent inits -> members disagree before training
    mp = np.asarray(out["member_probs"])
    assert not np.allclose(mp[0], mp[1])


def test_anomaly_from_confidence_monotone():
    conf = jnp.linspace(0.05, 1.0, 20)
    a = anomaly_from_confidence(conf)
    assert bool(jnp.all(a[:-1] >= a[1:]))  # non-increasing in confidence
    assert float(a[-1]) == 0.0
    assert bool(jnp.all((a >= 0) & (a <= 1)))


@pytest.mark.slow
def test_synthetic_dataset_deterministic():
    d1 = synthetic_cifar10(train_size=64, test_size=16, seed=7)
    d2 = synthetic_cifar10(train_size=64, test_size=16, seed=7)
    np.testing.assert_array_equal(d1.train_images, d2.train_images)
    assert d1.train_images.shape == (64, 32, 32, 3)
    assert d1.train_images.dtype == np.float32
    assert d1.train_images.min() >= 0.0 and d1.train_images.max() <= 1.0
    assert set(np.unique(d1.train_labels)) <= set(range(10))
    assert load_cifar10().source in ("cifar10", "synthetic")


def test_batch_iterator_epochs():
    x = np.arange(10, dtype=np.float32)[:, None]
    y = np.arange(10, dtype=np.int32)
    batches = list(batch_iterator(x, y, 4, epochs=1))
    assert len(batches) == 2  # drop remainder
    seen = np.concatenate([b[1] for b in batches])
    assert len(set(seen.tolist())) == 8


@pytest.mark.slow
def test_classifier_learns_synthetic(small_model):
    """End-to-end learning smoke: accuracy must clear chance by a wide margin
    within 120 steps on the synthetic set."""
    ds = synthetic_cifar10(train_size=2048, test_size=512, seed=1)
    params, _ = train_classifier(
        small_model, ds, num_steps=120, batch_size=128, learning_rate=2e-3, seed=0
    )
    out = classifier_eval_step(
        small_model.apply, params, jnp.asarray(ds.test_images[:256]), jnp.asarray(ds.test_labels[:256])
    )
    assert float(out["accuracy"]) > 0.5  # chance = 0.1


@pytest.mark.slow
def test_autoencoder_trains_and_flags_noise():
    ae = ConvAutoencoder(widths=(8, 16), latent=16)
    ds = synthetic_cifar10(train_size=512, test_size=64, seed=2)
    from fav_tpu.models.train import train_autoencoder

    params, metrics = train_autoencoder(ae, ds.train_images, num_steps=150, batch_size=64)
    clean = jnp.asarray(ds.test_images[:32])
    noisy = jnp.clip(clean + 0.4 * jax.random.normal(jax.random.PRNGKey(0), clean.shape), 0, 1)
    err_clean = ConvAutoencoder.reconstruction_error(ae.apply(params, clean), clean)
    err_noisy = ConvAutoencoder.reconstruction_error(ae.apply(params, noisy), noisy)
    # heavy unseen noise must reconstruct worse than in-distribution frames
    assert float(err_noisy.mean()) > float(err_clean.mean()) * 1.5


def test_blank_blind_spot_parity():
    """The reference documents that its AE-anomaly stays LOW on BLANK frames
    (an AE trained on lit frames reconstructs dark easily — the stated ML
    blind spot, reference anomaly_simulator.py:65-70). That behavior is a
    property of *their* model+data; the parity home for it is the anomaly
    simulator, which must score BLANK below the OK baseline."""
    from fav_tpu.sim.anomaly_sim import AnomalySimulator

    sim = AnomalySimulator(seed=42)
    ok = [sim.compute_anomaly(0.0, 0.5, "VISION_OK") for _ in range(50)]
    blank = [sim.compute_anomaly(0.0, 0.5, "VISION_BLANK") for _ in range(50)]
    corrupted = [sim.compute_anomaly(0.5, 0.5, "VISION_CORRUPTED") for _ in range(50)]
    assert np.mean(blank) < np.mean(ok) < np.mean(corrupted)


@pytest.mark.slow
def test_ensemble_train_step(small_model):
    import optax

    stacked = init_ensemble(small_model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), 3)
    tx = optax.adamw(1e-3)
    opt_state = jax.vmap(tx.init)(stacked)
    from fav_tpu.models.train import TrainState

    states = TrainState(stacked, opt_state, jnp.zeros((3,), jnp.int32))
    step = make_ensemble_train_step(small_model.apply, tx)
    ds = synthetic_cifar10(train_size=128, test_size=16, seed=4)
    x, y = jnp.asarray(ds.train_images[:64]), jnp.asarray(ds.train_labels[:64])
    states, metrics = step(states, x, y, jax.random.PRNGKey(1))
    assert metrics["loss"].shape == (3,)
    assert int(states.step[0]) == 1
    # members stay distinct after the update
    leaf = jax.tree_util.tree_leaves(states.params)[-1]
    assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[1]))


@pytest.mark.slow
def test_resnet_family_full_surface():
    """The second model family must ride every harness unchanged: forward,
    dropout-rng purity, MC-dropout, ensembles, one train step."""
    import optax

    from fav_tpu.models.train import classifier_train_step, create_train_state

    cfg = ModelParams(arch="resnet", widths=(8, 16), dropout_rate=0.1)
    model = create_model(cfg)
    assert type(model).__name__ == "ResNetSmall"
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    logits = jax.jit(model.apply)(params, x)
    assert logits.shape == (4, 10) and logits.dtype == jnp.float32

    out = mc_dropout_predict(model.apply, params, x, jax.random.PRNGKey(2), num_samples=3)
    assert out["member_probs"].shape == (3, 4, 10)

    stacked = init_ensemble(model, jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)), 2)
    eout = ensemble_predict(model.apply, stacked, x)
    assert eout["probs"].shape == (4, 10)

    state, tx = create_train_state(params, 1e-3)
    ds = synthetic_cifar10(train_size=64, test_size=8, seed=6)
    state2, metrics = classifier_train_step(
        model.apply, tx, state,
        jnp.asarray(ds.train_images[:32]), jnp.asarray(ds.train_labels[:32]),
        jax.random.PRNGKey(4),
    )
    assert float(metrics["loss"]) > 0
    assert int(state2.step) == 1


@pytest.mark.slow
def test_vit_family_full_surface():
    """Third model family (arch='vit'): forward, dropout-rng purity,
    MC-dropout, ensembles, one train step — every harness unchanged."""
    import optax

    from fav_tpu.models.train import classifier_train_step, create_train_state

    cfg = ModelParams(arch="vit", vit_dim=32, vit_depth=2, vit_heads=2, dropout_rate=0.1)
    model = create_model(cfg)
    assert type(model).__name__ == "VisionTransformer"
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    logits = jax.jit(model.apply)(params, x)
    assert logits.shape == (4, 10) and logits.dtype == jnp.float32

    out = mc_dropout_predict(model.apply, params, x, jax.random.PRNGKey(2), num_samples=3)
    assert out["member_probs"].shape == (3, 4, 10)

    stacked = init_ensemble(model, jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)), 2)
    eout = ensemble_predict(model.apply, stacked, x)
    assert eout["probs"].shape == (4, 10)

    state, tx = create_train_state(params, 1e-3)
    # the train step donates its state: snapshot a leaf before stepping
    leaf0 = np.asarray(jax.tree_util.tree_leaves(state.params)[-1]).copy()
    ds = synthetic_cifar10(train_size=64, test_size=8, seed=6)
    state2, metrics = classifier_train_step(
        model.apply, tx, state,
        jnp.asarray(ds.train_images[:32]), jnp.asarray(ds.train_labels[:32]),
        jax.random.PRNGKey(4),
    )
    assert jnp.isfinite(metrics["loss"])
    leaf1 = np.asarray(jax.tree_util.tree_leaves(state2.params)[-1])
    assert not np.allclose(leaf0, leaf1)


@pytest.mark.slow
def test_megastep_matches_per_step_loop():
    """The device-resident K-step scan (train_classifier(megastep=K)) must
    reproduce the per-step host loop's trajectory — same shuffle stream
    (data/cifar.index_iterator), same per-step PRNG splits, same step math
    (shared _*_step_core) — including a tail of remainder steps. One step
    agrees to ~1e-6 (the residue is XLA fusing the scan body differently
    than the standalone jit, pure fp reassociation); over 7 steps adamw
    compounds that to ~1e-3, so the multi-step tolerance is loose while any
    SEMANTIC divergence (wrong batch, wrong key chain) is orders larger."""
    from fav_tpu.models.train import train_classifier

    ds = synthetic_cifar10(train_size=96, test_size=8, seed=9)
    model = create_model(SMALL)
    # single step: tight bound pins the semantics
    p1_loop, _ = train_classifier(model, ds, num_steps=1, batch_size=16, seed=3)
    p1_mega, _ = train_classifier(model, ds, num_steps=1, batch_size=16, seed=3,
                                  megastep=1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5, rtol=0),
        p1_loop, p1_mega,
    )
    # 7 steps = 2 chunks of 3 + 1 per-step tail: loose bound, full plumbing
    p_loop, m_loop = train_classifier(model, ds, num_steps=7, batch_size=16, seed=3)
    p_mega, m_mega = train_classifier(
        model, ds, num_steps=7, batch_size=16, seed=3, megastep=3
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-2, rtol=0),
        p_loop, p_mega,
    )
    assert m_loop["loss"] == pytest.approx(m_mega["loss"], abs=5e-2)


@pytest.mark.slow
def test_megastep_matches_per_step_loop_augmix():
    from fav_tpu.models.train import train_classifier

    ds = synthetic_cifar10(train_size=64, test_size=8, seed=9)
    model = create_model(SMALL)
    p_loop, _ = train_classifier(
        model, ds, num_steps=4, batch_size=16, seed=5, augmix=True
    )
    p_mega, _ = train_classifier(
        model, ds, num_steps=4, batch_size=16, seed=5, augmix=True, megastep=4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-2, rtol=0),
        p_loop, p_mega,
    )


@pytest.mark.slow
def test_megastep_matches_per_step_loop_sam():
    """SAM+AugMix through the megastep (round 3 widened the megastep to
    every single-model objective) reproduces the per-step SAM loop."""
    from fav_tpu.models.train import train_classifier

    ds = synthetic_cifar10(train_size=64, test_size=8, seed=9)
    model = create_model(SMALL)
    p_loop, _ = train_classifier(
        model, ds, num_steps=3, batch_size=16, seed=5, augmix=True, sam_rho=0.05
    )
    p_mega, _ = train_classifier(
        model, ds, num_steps=3, batch_size=16, seed=5, augmix=True, sam_rho=0.05,
        megastep=3,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-2, rtol=0),
        p_loop, p_mega,
    )


@pytest.mark.slow
def test_ensemble_megastep_matches_per_step():
    """The ensemble megastep (lax.scan over K vmapped member updates with
    the train set resident) reproduces the per-step ensemble loop: same
    index stream, same one-split-per-step key chain, same member fan-out."""
    import optax

    from fav_tpu.data.cifar import index_iterator
    from fav_tpu.models.train import (
        TrainState,
        make_ensemble_megastep,
        make_ensemble_train_step,
    )
    from fav_tpu.models.uncertainty import init_ensemble

    ds = synthetic_cifar10(train_size=64, test_size=8, seed=9)
    model = create_model(SMALL)
    stacked = init_ensemble(model, jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)), 2)
    tx = optax.adamw(1e-3)

    def fresh():
        params = jax.tree.map(jnp.copy, stacked)
        return TrainState(params, jax.vmap(tx.init)(params), jnp.zeros((2,), jnp.int32))

    step = make_ensemble_train_step(model.apply, tx)
    states = fresh()
    key = jax.random.PRNGKey(7)
    idx_it = index_iterator(64, 16, seed=1)
    for _ in range(4):
        idx = next(idx_it)
        key, sub = jax.random.split(key)
        states, _ = step(
            states, jnp.asarray(ds.train_images[idx]),
            jnp.asarray(ds.train_labels[idx]), sub,
        )

    mega = make_ensemble_megastep(model.apply, tx)
    idx_it2 = index_iterator(64, 16, seed=1)
    chunk = np.stack([next(idx_it2) for _ in range(4)]).astype(np.int32)
    states2, key2, metrics = mega(
        fresh(), jnp.asarray(ds.train_images), jnp.asarray(ds.train_labels),
        jnp.asarray(chunk), jax.random.PRNGKey(7),
    )
    np.testing.assert_array_equal(np.asarray(key), np.asarray(key2))
    assert int(states2.step[0]) == 4 and metrics["loss"].shape == (2,)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-2, rtol=0),
        states.params, states2.params,
    )


@pytest.mark.slow  # ~7 s of model compiles; invariant unchanged per-commit
def test_standardize_input_affine_invariance():
    """`standardize_input` makes the forward invariant to affine luminance
    maps by construction (round-4 snow pre-registration,
    measurements/r4/snow_prereg.md) — the mechanism behind the snow/fog/
    contrast grid bases. f32 standardized inputs match to ~1e-6; the bf16
    forward amplifies that to ~1e-3 logits, so assert on argmax + tolerance.
    Also: the flag must change init params NOT at all (it is a pure input
    transform), and default-off must keep the legacy forward bitwise."""
    from fav_tpu.models.cnn import standardize_image

    mp = ModelParams(widths=(16, 32), dense_width=32, standardize_input=True)
    model = create_model(mp)
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:1])

    # affine map that stays inside [0,1] (no clip interference)
    x2 = 0.5 * x + 0.2
    l1, l2 = model.apply(params, x), model.apply(params, x2)
    assert jnp.all(jnp.argmax(l1, -1) == jnp.argmax(l2, -1))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=5e-3)
    # the pure transform itself is affine-invariant to f32 rounding
    np.testing.assert_allclose(
        np.asarray(standardize_image(x)), np.asarray(standardize_image(x2)),
        atol=1e-5,
    )

    # flag-off model: identical param tree structure/shapes (same template)
    plain = create_model(ModelParams(widths=(16, 32), dense_width=32))
    params_plain = plain.init(jax.random.PRNGKey(1), x[:1])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_plain,
    )


def test_standardize_input_metadata_roundtrip():
    """Checkpoint metadata carries standardize_input and every rebuild site
    (serving + evaluate, via config.model_params_from_metadata) restores the
    exact forward; absent key means legacy False."""
    from fav_tpu.config import model_params_from_metadata

    meta = {"arch": "vgg", "widths": [16, 32], "dense_width": 32,
            "standardize_input": True}
    mp = model_params_from_metadata(ModelParams(), meta)
    assert mp.standardize_input and mp.widths == (16, 32)
    legacy = model_params_from_metadata(ModelParams(), {"widths": [16, 32]})
    assert legacy.standardize_input is False
