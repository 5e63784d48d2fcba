"""Mesh / sharding tests on the 8 virtual CPU devices (conftest forces
``xla_force_host_platform_device_count=8``). Validates SURVEY.md §2.5: DP
over the corruption grid, ensemble member-per-device, and that sharded
results equal single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fav_tpu.config import ModelParams
from fav_tpu.data.cifar import synthetic_cifar10
from fav_tpu.models.cnn import create_model
from fav_tpu.models.uncertainty import ensemble_predict, init_ensemble
from fav_tpu.parallel.mesh import (
    auto_mesh_shape,
    build_mesh,
    data_sharding,
    ensemble_sharding,
    replicate,
    shard_params_for_ensemble,
)
from fav_tpu.parallel.sweep import corruption_sweep, sharded_sweep

SMALL = ModelParams(widths=(16, 32), dense_width=32)


@pytest.fixture(scope="module")
def model_and_params():
    model = create_model(SMALL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, params


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_auto_mesh_shape():
    assert auto_mesh_shape(8, ensemble_size=1) == (8, 1, 1)
    assert auto_mesh_shape(8, ensemble_size=4) == (2, 4, 1)
    assert auto_mesh_shape(8, ensemble_size=5) == (8, 1, 1)  # 5 doesn't divide 8
    assert auto_mesh_shape(4, ensemble_size=8) == (1, 4, 1)


def test_build_mesh_shapes():
    mesh = build_mesh((8, 1, 1))
    assert mesh.shape == {"data": 8, "ensemble": 1, "model": 1}
    mesh2 = build_mesh((2, 4, 1))
    assert mesh2.shape == {"data": 2, "ensemble": 4, "model": 1}
    with pytest.raises(ValueError):
        build_mesh((3, 1, 1))


def test_data_sharding_distributes(model_and_params):
    mesh = build_mesh((8, 1, 1))
    x = jnp.zeros((16, 32, 32, 3))
    xs = jax.device_put(x, data_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    # each shard holds B/8 examples
    assert xs.addressable_shards[0].data.shape == (2, 32, 32, 3)


def test_sharded_forward_matches_single(model_and_params):
    model, params = model_and_params
    mesh = build_mesh((8, 1, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    ref = jax.jit(model.apply)(params, x)
    xs = jax.device_put(x, data_sharding(mesh))
    ps = jax.device_put(params, replicate(mesh))
    got = jax.jit(model.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ensemble_member_per_device(model_and_params):
    model, _ = model_and_params
    mesh = build_mesh((2, 4, 1))
    stacked = init_ensemble(model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), 4)
    sharded = shard_params_for_ensemble(mesh, stacked)
    leaf = jax.tree_util.tree_leaves(sharded)[0]
    assert len(leaf.sharding.device_set) >= 4
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ref = ensemble_predict(model.apply, stacked, x)
    got = ensemble_predict(model.apply, sharded, x)
    np.testing.assert_allclose(
        np.asarray(ref["probs"]), np.asarray(got["probs"]), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_sharded_sweep_matches_unsharded(model_and_params):
    model, params = model_and_params
    mesh = build_mesh((8, 1, 1))
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=0)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    names = ("gaussian_noise", "brightness")
    sevs = (1, 3)
    key = jax.random.PRNGKey(7)
    ref = corruption_sweep(model.apply, params, x, y, key, names, sevs)
    got = sharded_sweep(mesh, model.apply, params, x, y, key, names, sevs)
    for n in names:
        for s in sevs:
            for metric in ("accuracy", "mean_confidence", "auroc"):
                assert ref[n][s][metric] == pytest.approx(got[n][s][metric], abs=3e-5), (n, s, metric)


def test_fused_sweep_matches_per_cell(model_and_params):
    """The one-program grid (fused_sweep) must reproduce the per-cell path
    cell-for-cell: same corruption draws (fold_in by cell index), same
    metric math — only the dispatch granularity differs."""
    from fav_tpu.parallel.sweep import fused_sweep, sweep_cell

    model, params = model_and_params
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=1)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    names = ("gaussian_noise", "contrast", "pixelate")
    sevs = (1, 4)
    key = jax.random.PRNGKey(13)
    got = fused_sweep(model.apply, params, x, y, key, names, sevs, temperature=1.7)
    cells = [(n, s) for n in names for s in sevs]
    for i, (n, s) in enumerate(cells):
        ref = sweep_cell(
            n, model.apply, params, x, y, jax.random.fold_in(key, i), s, 1.7
        )
        for metric in ("accuracy", "mean_confidence", "auroc", "aupr", "fpr_at_95",
                       # first-class L1 analyzer columns (sweep._l1_rows) must
                       # agree across dispatch granularities like every other
                       # metric — same corrupted batch, same analyzer pass
                       "l1_flag_rate", "l1_mean_anomaly", "auroc_l1",
                       "mean_anomaly_composed", "auroc_composed"):
            assert float(ref[metric]) == pytest.approx(got[n][s][metric], abs=3e-5), (n, s, metric)


@pytest.mark.slow
def test_per_cell_path_reproduces_fused(model_and_params):
    """`evaluate --per-cell` (corruption_sweep) must reproduce the default
    fused path cell-for-cell — both derive cell keys as fold_in(key,
    absolute_cell_index), so the debugging path sees the SAME corruption
    draws, not merely statistically comparable ones (round-2 advisor
    finding). Also pins the new calibration-under-shift metrics (ece,
    brier) to identical values on both paths."""
    from fav_tpu.parallel.sweep import fused_sweep

    model, params = model_and_params
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=9)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    names, sevs = ("gaussian_noise", "contrast"), (2, 5)
    key = jax.random.PRNGKey(31)
    fused = fused_sweep(model.apply, params, x, y, key, names, sevs, temperature=1.3)
    percell = corruption_sweep(model.apply, params, x, y, key, names, sevs,
                               temperature=1.3)
    for n in names:
        for s in sevs:
            assert set(fused[n][s]) == set(percell[n][s])
            for metric in fused[n][s]:
                assert fused[n][s][metric] == pytest.approx(
                    percell[n][s][metric], abs=3e-5
                ), (n, s, metric)


@pytest.mark.slow
def test_sweep_cell_ece_matches_direct_computation(model_and_params):
    """Per-cell ECE/Brier (calibration under shift) must equal computing the
    metrics directly on the cell's corrupted forward — the grid reports
    whether the clean-fit temperature survives each severity."""
    from fav_tpu.models.calibration import brier_score, expected_calibration_error
    from fav_tpu.ops.corruptions import corruption_fn
    from fav_tpu.parallel.sweep import sweep_cell

    model, params = model_and_params
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=12)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    key = jax.random.PRNGKey(5)
    temp = 1.6
    cell = sweep_cell("fog", model.apply, params, x, y, key, 4, temp)
    corrupted = corruption_fn("fog")(key, x, 4)
    probs = jax.nn.softmax(model.apply(params, corrupted) / temp, axis=-1)
    conf = jnp.max(probs, axis=-1)
    correct = (jnp.argmax(probs, axis=-1) == y).astype(jnp.float32)
    # f32 fusion-order noise between the one-program cell and the two-step
    # recomputation lands around 5e-6; 1e-4 still pins the binning semantics
    assert float(cell["ece"]) == pytest.approx(
        float(expected_calibration_error(conf, correct)), abs=1e-4
    )
    assert float(cell["brier"]) == pytest.approx(
        float(brier_score(probs, y)), abs=1e-4
    )


@pytest.mark.slow
def test_fused_sweep_chunking_invariant(model_and_params):
    """cells_per_call must not change any cell's result — per-cell keys fold
    in the absolute grid index (the HBM-bounded chunked path for
    multi-forward scorers has to score identically to one big program)."""
    from fav_tpu.parallel.sweep import fused_sweep

    model, params = model_and_params
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=5)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    names, sevs = ("gaussian_noise", "fog", "pixelate"), (2, 5)
    key = jax.random.PRNGKey(23)
    one = fused_sweep(model.apply, params, x, y, key, names, sevs)
    chunked = fused_sweep(model.apply, params, x, y, key, names, sevs, cells_per_call=2)
    for n in names:
        for s in sevs:
            for metric in ("accuracy", "mean_confidence", "auroc"):
                assert one[n][s][metric] == pytest.approx(chunked[n][s][metric], abs=1e-7), (n, s)


def test_fused_sweep_sharded_matches(model_and_params):
    """fused=True through sharded_sweep equals the unsharded fused grid."""
    from fav_tpu.parallel.sweep import fused_sweep

    model, params = model_and_params
    mesh = build_mesh((8, 1, 1))
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=3)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    names, sevs = ("impulse_noise", "brightness"), (2, 5)
    key = jax.random.PRNGKey(17)
    ref = fused_sweep(model.apply, params, x, y, key, names, sevs)
    got = sharded_sweep(mesh, model.apply, params, x, y, key, names, sevs, fused=True)
    for n in names:
        for s in sevs:
            for metric in ("accuracy", "mean_confidence", "auroc"):
                assert ref[n][s][metric] == pytest.approx(got[n][s][metric], abs=3e-5), (n, s, metric)


def test_multislice_dcn_sweep_matches_unsharded(model_and_params):
    """Multi-slice scale-out (SURVEY.md §2.5/§5.8 stretch): a 2-slice x
    (2,2,1) virtual topology with the explicit dcn axis must reproduce the
    single-device grid exactly — per-image work stays intra-slice, only the
    scalar metric psums cross the dcn axis."""
    from fav_tpu.parallel.mesh import build_multislice_mesh, hierarchical_data_sharding

    model, params = model_and_params
    mesh = build_multislice_mesh(n_slices=2, per_slice_shape=(2, 2, 1))
    assert mesh.shape == {"dcn": 2, "data": 2, "ensemble": 2, "model": 1}

    ds = synthetic_cifar10(train_size=8, test_size=64, seed=2)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    # the hierarchical sharding splits the batch 4-ways: 2 slices x 2 data
    sharded_x = jax.device_put(x, hierarchical_data_sharding(mesh))
    assert len(sharded_x.addressable_shards) == 8
    assert sharded_x.addressable_shards[0].data.shape[0] == x.shape[0] // 4

    names, sevs = ("gaussian_noise", "contrast"), (2,)
    key = jax.random.PRNGKey(11)
    ref = corruption_sweep(model.apply, params, x, y, key, names, sevs)
    got = sharded_sweep(mesh, model.apply, params, x, y, key, names, sevs)
    for n in names:
        for metric in ("accuracy", "mean_confidence", "auroc"):
            assert ref[n][2][metric] == pytest.approx(got[n][2][metric], abs=3e-5), (n, metric)


def test_multislice_mesh_validation():
    from fav_tpu.parallel.mesh import build_multislice_mesh

    with pytest.raises(ValueError):
        build_multislice_mesh(n_slices=3)  # 8 devices don't split into 3
    with pytest.raises(ValueError):
        build_multislice_mesh(n_slices=2, per_slice_shape=(3, 1, 1))


def test_sweep_degrades_with_severity(model_and_params):
    """Confidence/anomaly monotonicity sanity: severity 5 gaussian noise must
    lower confidence vs severity 1 on a trained-ish model (here: random
    params still show the corruption is applied — check accuracy field
    exists and anomaly rises)."""
    model, params = model_and_params
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=1)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    res = corruption_sweep(
        model.apply, params, x, y, jax.random.PRNGKey(0), ("gaussian_noise",), (1, 5)
    )
    cell1, cell5 = res["gaussian_noise"][1], res["gaussian_noise"][5]
    for k in ("accuracy", "mean_confidence", "mean_entropy", "auroc", "mean_anomaly", "failure_rate"):
        assert k in cell1
    assert 0.0 <= cell1["accuracy"] <= 1.0


def test_sharded_train_step():
    """One jitted train step with data sharded over 8 devices must match the
    single-device update (same batch, same key).

    Uses float32 compute and plain SGD: with Adam, a near-zero gradient whose
    sign flips under cross-device reduction reassociation moves a weight by
    +-lr — a property of Adam, not a sharding bug.
    """
    import optax

    from fav_tpu.models.train import TrainState, classifier_train_step

    model = create_model(ModelParams(widths=(16, 32), dense_width=32, compute_dtype="float32"))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    mesh = build_mesh((8, 1, 1))
    ds = synthetic_cifar10(train_size=64, test_size=8, seed=2)
    x, y = jnp.asarray(ds.train_images[:32]), jnp.asarray(ds.train_labels[:32])
    key = jax.random.PRNGKey(3)
    tx = optax.sgd(1e-2)

    # train_step donates its state — give each run a private params copy
    state_ref = TrainState(jax.tree.map(jnp.copy, params), tx.init(params), jnp.zeros((), jnp.int32))
    sref, mref = classifier_train_step(model.apply, tx, state_ref, x, y, key)

    state2 = TrainState(jax.tree.map(jnp.copy, params), tx.init(params), jnp.zeros((), jnp.int32))
    state2 = jax.device_put(state2, replicate(mesh))
    xs = jax.device_put(x, data_sharding(mesh))
    ys = jax.device_put(y, NamedSharding(mesh, P("data")))
    sgot, mgot = classifier_train_step(model.apply, tx, state2, xs, ys, key)

    assert float(mref["loss"]) == pytest.approx(float(mgot["loss"]), abs=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(sref.params), jax.tree_util.tree_leaves(sgot.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_ensemble_megastep_sharded():
    """The device-resident ensemble megastep compiles and executes with the
    member axis sharded over the mesh's ensemble dimension and the resident
    train set replicated — the layout ``pretrain --ensemble --shard
    --megastep K`` uses. Kept tiny (K=2, 4 members): each scanned step costs
    seconds of SPMD emulation on the threaded virtual mesh."""
    import optax

    from fav_tpu.models.train import TrainState, make_ensemble_megastep
    from fav_tpu.models.uncertainty import init_ensemble

    model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    stacked = init_ensemble(model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), 4)
    tx = optax.adamw(1e-3)
    states = TrainState(
        stacked, jax.vmap(tx.init)(stacked), jnp.zeros((4,), jnp.int32)
    )
    mesh = build_mesh((2, 4, 1))
    states = jax.tree.map(
        lambda l: jax.device_put(
            l, NamedSharding(mesh, P("ensemble", *([None] * (l.ndim - 1))))
        ),
        states,
    )
    ds = synthetic_cifar10(train_size=64, test_size=8, seed=2)
    repl = NamedSharding(mesh, P())
    imgs = jax.device_put(jnp.asarray(ds.train_images), repl)
    lbls = jax.device_put(jnp.asarray(ds.train_labels), repl)
    mega = make_ensemble_megastep(model.apply, tx)
    idx = jnp.stack([jnp.arange(8), jnp.arange(8, 16)]).astype(jnp.int32)
    states, key, metrics = mega(states, imgs, lbls, idx, jax.random.PRNGKey(1))
    assert metrics["loss"].shape == (4,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert int(np.asarray(states.step)[0]) == 2
    # member axis stays sharded over the ensemble dimension after the scan
    first = jax.tree_util.tree_leaves(states.params)[0]
    assert len(first.sharding.device_set) >= 4


@pytest.mark.slow
def test_vit_tensor_parallel_matches_single():
    """The reserved 'model' axis made real: a ViT forward with attention
    heads and MLP hidden sharded tensor-parallel over 4 devices must equal
    the single-device forward (XLA inserts the block psums)."""
    from fav_tpu.models.vit import tp_shard_vit_params

    cfg = ModelParams(arch="vit", vit_dim=32, vit_depth=2, vit_heads=4,
                      dropout_rate=0.0, compute_dtype="float32")
    model = create_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:1])
    want = np.asarray(jax.jit(model.apply)(params, x))

    mesh = build_mesh((2, 1, 4))  # data=2, model=4
    sharded_params = tp_shard_vit_params(mesh, params)
    sharded_x = jax.device_put(
        x, NamedSharding(mesh, P("data", None, None, None))
    )
    got = np.asarray(jax.jit(model.apply)(sharded_params, sharded_x))
    np.testing.assert_allclose(got, want, atol=2e-5)
    # the sharding actually took: q/k/v kernels live on the model axis
    qkv = [
        leaf for path, leaf in jax.tree_util.tree_flatten_with_path(sharded_params)[0]
        if len(path) >= 2
        and str(getattr(path[-2], "key", "")) in ("query", "key", "value")
        and str(getattr(path[-1], "key", "")) == "kernel"
        and leaf.ndim == 3
    ]
    assert qkv, "no qkv kernels found"
    assert all(len(k.addressable_shards) == 8 for k in qkv)
    assert any(
        s.data.shape[-2] == 1 for k in qkv for s in k.addressable_shards
    ), "heads not sharded over the model axis"


def test_sweep_cell_detection_metric_suite():
    """AUPR + FPR@95 ride every cell next to AUROC (calibration.py oracles)."""
    import jax

    from fav_tpu.config import ModelParams
    from fav_tpu.models.cnn import create_model
    from fav_tpu.parallel.sweep import sweep_cell

    model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    x = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 32, 3), jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(1), (32,), 0, 10)
    v = model.init(jax.random.PRNGKey(2), x[:1])
    cell = sweep_cell("gaussian_noise", model.apply, v, x, y, jax.random.PRNGKey(3), 3)
    for k in ("aupr", "fpr_at_95", "auroc_energy"):
        assert 0.0 <= float(cell[k]) <= 1.0, (k, float(cell[k]))


def test_energy_score_ranks_low_evidence():
    """Energy (Liu et al. 2020) must be higher (more failure-prone) for a
    uniformly-small logit row than for one with strong evidence, and be
    invariant to what softmax would saturate away only when magnitudes
    genuinely differ."""
    from fav_tpu.models.uncertainty import energy_score

    strong = jnp.array([[10.0, 0.0, 0.0]])
    weak = jnp.array([[0.5, 0.0, 0.0]])  # same argmax, tiny evidence
    assert float(energy_score(weak)[0]) > float(energy_score(strong)[0])
    # MSP cannot separate two saturated rows of different magnitude; energy can
    sat_small = jnp.array([[5.0, -5.0, -5.0]])
    sat_big = jnp.array([[50.0, -50.0, -50.0]])
    assert float(energy_score(sat_small)[0]) > float(energy_score(sat_big)[0])


@pytest.mark.slow
def test_fused_sweep_return_probs_consistent(model_and_params):
    """return_probs=True ships each cell's temperature-scaled prob rows and
    must neither change the metrics nor disagree with them: per-cell mean
    max-prob == the cell's mean_confidence."""
    import numpy as np

    from fav_tpu.parallel.sweep import fused_sweep

    model, params = model_and_params
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=2)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    names = ("gaussian_noise", "fog")
    sevs = (1, 3)
    key = jax.random.PRNGKey(5)
    plain = fused_sweep(model.apply, params, x, y, key, names, sevs, temperature=1.2)
    got, cells, probs = fused_sweep(
        model.apply, params, x, y, key, names, sevs, temperature=1.2,
        return_probs=True,
    )
    assert len(probs) == len(cells) == 4
    for i, (n, s) in enumerate(cells):
        rows = np.asarray(probs[i])
        assert rows.shape == (64, 10)
        np.testing.assert_allclose(rows.sum(axis=1), 1.0, atol=1e-5)
        assert rows.max(axis=1).mean() == pytest.approx(
            got[n][s]["mean_confidence"], abs=3e-5)
        for metric in plain[n][s]:
            assert plain[n][s][metric] == pytest.approx(
                got[n][s][metric], abs=3e-5), (n, s, metric)


@pytest.mark.slow
def test_monitored_sweep_self_monitor_reproduces_plain(model_and_params):
    """monitor=(predictor itself) must reproduce the plain sweep exactly:
    same corrupted batches (same fold_in schedule), so accuracy AND every
    detection metric agree, and auroc_self/ece_self equal the operative
    auroc/ece."""
    from fav_tpu.parallel.sweep import fused_sweep

    model, params = model_and_params
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=3)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    names = ("gaussian_noise", "snow")
    sevs = (1, 5)
    key = jax.random.PRNGKey(9)
    plain = fused_sweep(model.apply, params, x, y, key, names, sevs,
                        temperature=1.3)
    mon = fused_sweep(model.apply, params, x, y, key, names, sevs,
                      temperature=1.3, monitor=(model.apply, params, 1.3))
    for n in names:
        for s in sevs:
            for metric in ("accuracy", "mean_confidence", "auroc", "aupr",
                           "fpr_at_95", "ece", "brier"):
                assert plain[n][s][metric] == pytest.approx(
                    mon[n][s][metric], abs=3e-5
                ), (n, s, metric)
            assert mon[n][s]["auroc_self"] == pytest.approx(
                mon[n][s]["auroc"], abs=3e-5
            )
            assert mon[n][s]["ece_self"] == pytest.approx(
                mon[n][s]["ece"], abs=3e-5
            )
            # min(conf, conf) == conf: gated metrics collapse to self
            assert mon[n][s]["auroc_gated"] == pytest.approx(
                mon[n][s]["auroc"], abs=3e-5
            )
            assert mon[n][s]["ece_gated"] == pytest.approx(
                mon[n][s]["ece"], abs=3e-5
            )


def test_monitored_sweep_decoupled_scores(model_and_params):
    """With a DISTINCT monitor: predictions (accuracy/failure_rate/brier)
    must be bitwise those of the predictor-only sweep (same corrupted
    batch), while the operative confidence comes from the monitor —
    mean_confidence matches the monitor's own sweep of the same cells."""
    from fav_tpu.parallel.sweep import fused_sweep

    model, params = model_and_params
    mon_model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    mon_params = mon_model.init(jax.random.PRNGKey(4), jnp.zeros((1, 32, 32, 3)))
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=4)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    names = ("contrast",)
    sevs = (2, 4)
    key = jax.random.PRNGKey(17)
    plain = fused_sweep(model.apply, params, x, y, key, names, sevs,
                        temperature=1.1)
    mon_own = fused_sweep(mon_model.apply, mon_params, x, y, key, names, sevs,
                          temperature=0.9)
    got = fused_sweep(model.apply, params, x, y, key, names, sevs,
                      temperature=1.1,
                      monitor=(mon_model.apply, mon_params, 0.9))
    for n in names:
        for s in sevs:
            for metric in ("accuracy", "failure_rate", "brier"):
                assert got[n][s][metric] == pytest.approx(
                    plain[n][s][metric], abs=3e-5
                ), (n, s, metric)
            # operative confidence is the monitor's
            assert got[n][s]["mean_confidence"] == pytest.approx(
                mon_own[n][s]["mean_confidence"], abs=3e-5
            )
            # predictor self-scores preserved
            assert got[n][s]["auroc_self"] == pytest.approx(
                plain[n][s]["auroc"], abs=3e-5
            )
            assert got[n][s]["ece_self"] == pytest.approx(
                plain[n][s]["ece"], abs=3e-5
            )
            # the min-gate can only lower the operative confidence
            assert got[n][s]["mean_confidence_gated"] <= min(
                got[n][s]["mean_confidence"], plain[n][s]["mean_confidence"]
            ) + 3e-5
    # monitor and return_probs are mutually exclusive
    with pytest.raises(ValueError):
        fused_sweep(model.apply, params, x, y, key, names, sevs,
                    return_probs=True,
                    monitor=(mon_model.apply, mon_params, 1.0))


def test_monitored_sweep_sharded_matches(model_and_params):
    """sharded_sweep(monitor=...) over the 8-device data axis must reproduce
    the single-device monitored grid (params/monitor replicated, batch
    sharded)."""
    from fav_tpu.parallel.sweep import fused_sweep, sharded_sweep

    model, params = model_and_params
    mon_model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    mon_params = mon_model.init(jax.random.PRNGKey(4), jnp.zeros((1, 32, 32, 3)))
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=5)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    names = ("fog",)
    sevs = (3,)
    key = jax.random.PRNGKey(21)
    ref = fused_sweep(model.apply, params, x, y, key, names, sevs,
                      temperature=1.2,
                      monitor=(mon_model.apply, mon_params, 0.8))
    mesh = build_mesh((8, 1, 1))
    got = sharded_sweep(mesh, model.apply, params, x, y, key,
                        corruptions=names, severities=sevs, temperature=1.2,
                        fused=True,
                        monitor=(mon_model.apply, mon_params, 0.8))
    for metric in ref["fog"][3]:
        assert ref["fog"][3][metric] == pytest.approx(
            got["fog"][3][metric], abs=3e-5), metric
    with pytest.raises(ValueError):
        sharded_sweep(mesh, model.apply, params, x, y, key,
                      corruptions=names, severities=sevs, fused=False,
                      monitor=(mon_model.apply, mon_params, 0.8))
