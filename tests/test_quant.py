"""Int8 W8A8 post-training quantization (fav_tpu/models/quant.py).

The quantized path must be a drop-in for the bf16 forward: the fp functional
mirror is pinned against ``model.apply`` and the int8 path against trained-
checkpoint accuracy (reference has no quantization story — this is the TPU
build's own perf surface, BASELINE.json throughput target).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.config import ModelParams
from fav_tpu.models.cnn import FailureAwareCNN, create_model
from fav_tpu.models.quant import (
    calibrate_cnn,
    functional_forward,
    quantize_cnn,
    quantized_forward,
)

CKPT_DIR = os.path.join(os.path.dirname(__file__), "..", "fav_tpu", "checkpoints", "classifier")


@pytest.fixture(scope="module")
def toy():
    model = FailureAwareCNN(compute_dtype="float32")
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x[:1])
    return model, variables, x


@pytest.mark.slow
def test_fp_mirror_matches_flax_apply(toy):
    model, variables, x = toy
    ref = model.apply(variables, x)
    mirror = functional_forward(variables, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(mirror), atol=1e-4)


@pytest.mark.slow
def test_fp_mirror_matches_bf16_apply(toy):
    _, variables, x = toy
    model = FailureAwareCNN(compute_dtype="bfloat16")
    ref = model.apply(variables, x)
    mirror = functional_forward(variables, x)  # bf16 default
    np.testing.assert_allclose(np.asarray(ref), np.asarray(mirror), atol=0.15)


@pytest.mark.slow
def test_calibration_scale_shapes(toy):
    _, variables, x = toy
    scales = calibrate_cnn(variables, x)
    assert scales.shape == (8,)  # Conv_1..Conv_8 (stem excluded)
    assert bool(jnp.all(scales > 0))
    q = quantize_cnn(variables, x)
    assert len(q.qweights) == 8 and len(q.wscales) == 8
    widths = (64, 64, 128, 128, 128, 256, 256, 256)
    for w8, sw, width in zip(q.qweights, q.wscales, widths):
        assert w8.dtype == jnp.int8 and w8.shape[-1] == width
        assert sw.shape == (width,)


@pytest.mark.slow
def test_quantized_forward_tracks_fp(toy):
    _, variables, x = toy
    q = quantize_cnn(variables, x)
    fp = functional_forward(variables, x, compute_dtype=jnp.float32)
    qi8 = quantized_forward(q, x)
    # random-init logits are tiny; the int8 path must stay within a hair
    assert float(jnp.max(jnp.abs(fp - qi8))) < 0.05
    assert bool(jnp.all(jnp.argmax(fp, -1) == jnp.argmax(qi8, -1)))


@pytest.mark.slow
def test_im2col_int8_conv_matches_xla_conv_bitwise():
    """The im2col + int8-dot lowering (the 248-TOPS MXU route, VERDICT round
    2 int8 item) must equal XLA's int8 conv BITWISE — int32 accumulation is
    exact, so any difference is a patch/kernel-order or padding bug."""
    from jax import lax

    from fav_tpu.models.quant import _conv, _conv_im2col_int8

    rng = np.random.default_rng(0)
    for (b, h, w, cin, cout, strides) in [
        (4, 32, 32, 16, 32, (1, 1)),
        (4, 32, 32, 16, 32, (2, 2)),
        (2, 16, 16, 8, 8, (2, 2)),
        (2, 15, 17, 8, 8, (2, 2)),  # odd dims exercise asymmetric SAME pad
        (2, 15, 17, 8, 8, (1, 1)),
    ]:
        x = jnp.asarray(rng.integers(-127, 128, (b, h, w, cin)), jnp.int8)
        k = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        ref = _conv(x, k, strides, out_dtype=jnp.int32)
        got = _conv_im2col_int8(x, k, strides)
        assert got.shape == ref.shape, (strides, got.shape, ref.shape)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
def test_quantized_forward_im2col_matches_conv(toy):
    """End-to-end: the im2col int8 forward equals the conv int8 forward
    (same quantization, same int32 math — only the MXU lowering differs)."""
    _, variables, x = toy
    q = quantize_cnn(variables, x)
    a = quantized_forward(q, x, int8_algo="conv")
    b = quantized_forward(q, x, int8_algo="im2col")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_quantized_checkpoint_accuracy():
    """Int8 accuracy on the committed trained checkpoint: <= 1% drop."""
    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.utils.checkpoint import restore_checkpoint

    model = create_model(ModelParams(arch="vgg"))
    ds = load_cifar10()
    x = jnp.asarray(ds.test_images[:1024])
    y = jnp.asarray(ds.test_labels[:1024])
    template = model.init(jax.random.PRNGKey(0), x[:1])
    variables, meta = restore_checkpoint(CKPT_DIR, template)
    assert meta.get("arch") == "vgg"

    fp_logits = jax.jit(model.apply)(variables, x)
    q = quantize_cnn(variables, x[:256])
    q_logits = jax.jit(lambda xx: quantized_forward(q, xx))(x)

    fp_acc = float(jnp.mean((jnp.argmax(fp_logits, -1) == y).astype(jnp.float32)))
    q_acc = float(jnp.mean((jnp.argmax(q_logits, -1) == y).astype(jnp.float32)))
    assert q_acc >= fp_acc - 0.01, (fp_acc, q_acc)
    # confidence scalars feed the trust engine: they must track closely too
    fp_conf = jnp.max(jax.nn.softmax(fp_logits, -1), -1)
    q_conf = jnp.max(jax.nn.softmax(q_logits, -1), -1)
    assert float(jnp.mean(jnp.abs(fp_conf - q_conf))) < 0.02
