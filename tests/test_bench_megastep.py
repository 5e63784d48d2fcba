"""The headline-bench megastep must also run sharded over the mesh data
axis (ties bench.py's single-chip number to the multi-chip scaling story)
and produce identical metrics to the unsharded program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.config import ModelParams
from fav_tpu.models.cnn import create_model
from fav_tpu.models.uncertainty import anomaly_from_confidence
from fav_tpu.ops.corruptions import corruption_fn
from fav_tpu.parallel.mesh import build_mesh, data_sharding, replicate

CELLS = (("brightness", 3), ("contrast", 2))  # deterministic-friendly subset


def _megastep(model, fns):
    @jax.jit
    def megastep(variables, images, key):
        keys = jax.random.split(key, len(fns))
        confs = []
        for (fn, severity), k in zip(fns, keys):
            corrupted = fn(k, images, severity)
            logits = model.apply(variables, corrupted)
            conf = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
            confs.append(jnp.mean(anomaly_from_confidence(conf)))
        return jnp.stack(confs)

    return megastep


@pytest.mark.slow
def test_megastep_sharded_matches_single():
    model = create_model(ModelParams(widths=(8, 16), dense_width=16, compute_dtype="float32"))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    images = jax.random.uniform(jax.random.PRNGKey(1), (64, 32, 32, 3), jnp.float32)
    fns = [(corruption_fn(n), s) for n, s in CELLS]
    megastep = _megastep(model, fns)
    key = jax.random.PRNGKey(2)

    ref = megastep(variables, images, key)

    mesh = build_mesh((8, 1, 1))
    xs = jax.device_put(images, data_sharding(mesh))
    vs = jax.device_put(variables, replicate(mesh))
    got = megastep(vs, xs, key)

    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-5)
    assert len(got.sharding.device_set) >= 1  # executed under the mesh


@pytest.mark.slow
def test_megastep_deterministic_per_key():
    model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    images = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3), jnp.float32)
    fns = [(corruption_fn(n), s) for n, s in CELLS]
    megastep = _megastep(model, fns)
    a = megastep(variables, images, jax.random.PRNGKey(3))
    b = megastep(variables, images, jax.random.PRNGKey(3))
    c = megastep(variables, images, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (len(CELLS),)
    del c  # different key may or may not differ for photometric cells
