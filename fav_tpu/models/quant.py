"""Post-training W8A8 int8 quantization for the VGG-style classifier.

The reference has no serving-speed story at all (its "model" is a heuristic
proxy, reference platform/backend/anomaly_simulator.py:7-9); the TPU build's
headline is corrupted-images/sec through the real CNN (BASELINE.json). The
v5e MXU executes s8 x s8 -> s32 at twice the bf16 rate (measured: 248 TOPS
vs 147 TFLOPS on an 8192^2 dot; 3.8x on the model's 32x32x64 convs, whose
bf16 lowering is far off peak), so an int8 inference path is the idiomatic
TPU way to push the detection pipeline past the bf16 roofline.

Scheme — standard symmetric post-training quantization:

* **weights**: per-output-channel int8, scale = amax/127 over (kh, kw, cin),
* **activations**: per-tensor int8, scales calibrated with one fp forward
  over a calibration batch (every quantized conv input is a relu output, so
  the int8 range is effectively [0, 127]),
* conv accumulates in **int32** on the MXU (`preferred_element_type`),
  dequant + bias + GroupNorm + relu run in bf16/f32 exactly like the fp
  model, and the next layer's quantize fuses into that epilogue under XLA,
* the 3-channel stem conv and the two dense heads stay in bf16/f32 — they
  are a rounding error of the FLOPs and the logit head wants the precision.

The functional forward here mirrors :class:`fav_tpu.models.cnn.FailureAwareCNN`
layer-for-layer and reads its exact flax param tree, so any trained vgg
checkpoint quantizes without retraining. Equivalence of the fp mirror and
accuracy of the int8 path are pinned in tests/test_quant.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "QuantizedCNN",
    "functional_forward",
    "calibrate_cnn",
    "quantize_cnn",
    "quantized_forward",
]

_EPS = 1e-6  # flax nn.GroupNorm default


class QuantizedCNN(NamedTuple):
    """Quantized parameter bundle for ``FailureAwareCNN`` (arch='vgg').

    ``qweights``/``wscales`` hold the int8 kernels and per-channel scales of
    every conv except the stem; ``act_scales`` are the calibrated per-tensor
    input scales for those convs (same order). ``fp`` is the original flax
    param tree — stem conv, GroupNorm affines, biases and dense heads read
    from it unchanged.
    """

    qweights: tuple  # int8 [kh, kw, cin, cout] per quantized conv
    wscales: tuple  # float32 [cout] per quantized conv
    act_scales: jax.Array  # float32 [n_quantized_convs]
    fp: Any  # original flax variables {'params': ...}
    widths: tuple  # stage widths, for the forward's layer walk


def _group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, groups: int) -> jax.Array:
    """Functional mirror of flax nn.GroupNorm (stats in f32, eps 1e-6)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    xn = ((xf - mean) * lax.rsqrt(var + _EPS)).reshape(b, h, w, c)
    return (xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _conv(x: jax.Array, kernel: jax.Array, strides=(1, 1), *, out_dtype=None) -> jax.Array:
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, kernel, strides, "SAME", dimension_numbers=dn,
        preferred_element_type=out_dtype,
    )


def _quantize_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-tensor activation quantization. Inputs are relu outputs (>= 0)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)


def _conv_im2col_int8(x: jax.Array, kernel: jax.Array, strides=(1, 1)) -> jax.Array:
    """Int8 conv as im2col + one s8 x s8 -> s32 ``dot_general``.

    Rationale (VERDICT round 2, int8 item): XLA's TPU *conv* lowering for
    int8 reaches only 52-66 TOPS (~17% of the 394 TOPS s8 peak) while an
    int8 *dot* hits 248 TOPS — so reshape the conv into the dot the MXU is
    fast at. kh*kw shifted strided slices (VPU copies, no gathers)
    concatenate into [B*OH*OW, kh*kw*Cin] patches; the kernel flattens to
    [kh*kw*Cin, Cout] in the same (dy, dx, cin) order. Padding replicates
    XLA's SAME convention (asymmetric: lo = total//2). Int32 accumulation is
    exact, so this matches ``lax.conv_general_dilated`` BITWISE — pinned in
    tests/test_quant.py.
    """
    kh, kw, cin, cout = kernel.shape
    b, h, w, _ = x.shape
    sh, sw = strides
    oh, ow = -(-h // sh), -(-w // sw)
    pad_h = max((oh - 1) * sh + kh - h, 0)
    pad_w = max((ow - 1) * sw + kw - w, 0)
    xp = jnp.pad(
        x,
        ((0, 0), (pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
    )
    patches = [
        xp[:, dy : dy + (oh - 1) * sh + 1 : sh, dx : dx + (ow - 1) * sw + 1 : sw, :]
        for dy in range(kh)
        for dx in range(kw)
    ]
    lhs = jnp.concatenate(patches, axis=-1).reshape(b * oh * ow, kh * kw * cin)
    rhs = kernel.reshape(kh * kw * cin, cout)
    y = lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return y.reshape(b, oh, ow, cout)


# Layer walk shared by the fp mirror, calibration and the int8 path.
# FailureAwareCNN's @nn.compact naming: Conv_{3s..3s+2} + GroupNorm_{2s,2s+1}
# per stage s, then Dense_0/Dense_1 (cnn.py:64-82).


def functional_forward(
    variables: Any,
    x: jax.Array,
    widths: Sequence[int] = (64, 128, 256),
    *,
    quant: QuantizedCNN | None = None,
    collect_amax: bool = False,
    compute_dtype=jnp.bfloat16,
    int8_algo: str = "conv",
):
    """Forward pass mirroring FailureAwareCNN.apply (inference mode).

    Three modes:
      * fp mirror (default) — numerically matches ``model.apply``,
      * ``collect_amax=True`` — also returns the per-tensor amax at every
        quantized-conv input (the calibration observables),
      * ``quant=...`` — runs Conv_1..Conv_8 on the MXU in int8;
        ``int8_algo`` picks the lowering: ``"conv"`` (XLA's int8 conv) or
        ``"im2col"`` (patches + int8 dot_general — the 248-TOPS dot route).
    """
    p = variables["params"]
    h = x.astype(compute_dtype)
    amaxes = []
    qi = 0  # index into quantized-conv tables (stem excluded)

    def conv_layer(h, name, strides):
        nonlocal qi
        kernel = p[name]["kernel"]
        bias = p[name]["bias"]
        is_stem = name == "Conv_0"
        if is_stem or quant is None:
            if collect_amax and not is_stem:
                amaxes.append(jnp.max(jnp.abs(h)).astype(jnp.float32))
            y = _conv(h, kernel.astype(compute_dtype), strides, out_dtype=compute_dtype)
        else:
            s_x = quant.act_scales[qi]
            x_i8 = _quantize_act(h, s_x)
            if int8_algo == "im2col":
                y_i32 = _conv_im2col_int8(x_i8, quant.qweights[qi], strides)
            else:
                y_i32 = _conv(x_i8, quant.qweights[qi], strides, out_dtype=jnp.int32)
            y = (y_i32.astype(jnp.float32) * (s_x * quant.wscales[qi])).astype(compute_dtype)
        if not is_stem:
            qi += 1
        return y + bias.astype(compute_dtype)

    conv_i = gn_i = 0
    for width in widths:
        for _ in range(2):
            h = conv_layer(h, f"Conv_{conv_i}", (1, 1))
            conv_i += 1
            gn = p[f"GroupNorm_{gn_i}"]
            h = _group_norm(h, gn["scale"], gn["bias"], min(32, width))
            gn_i += 1
            h = jax.nn.relu(h)
        h = conv_layer(h, f"Conv_{conv_i}", (2, 2))
        conv_i += 1
        h = jax.nn.relu(h)
        # Dropout is deterministic (inference): identity.
    h = jnp.mean(h, axis=(-3, -2))
    d0 = p["Dense_0"]
    h = jax.nn.relu(h @ d0["kernel"].astype(compute_dtype) + d0["bias"].astype(compute_dtype))
    d1 = p["Dense_1"]
    logits = h.astype(jnp.float32) @ d1["kernel"].astype(jnp.float32) + d1["bias"]
    if collect_amax:
        return logits, jnp.stack(amaxes)
    return logits


def calibrate_cnn(
    variables: Any,
    calib_images: jax.Array,
    widths: Sequence[int] = (64, 128, 256),
) -> jax.Array:
    """One fp pass over a calibration batch -> per-tensor activation scales."""
    _, amax = jax.jit(
        lambda v, x: functional_forward(v, x, tuple(widths), collect_amax=True)
    )(variables, calib_images)
    return jnp.maximum(amax, 1e-8) / 127.0


def quantize_cnn(
    variables: Any,
    calib_images: jax.Array,
    widths: Sequence[int] = (64, 128, 256),
) -> QuantizedCNN:
    """Post-training quantization: int8 kernels + calibrated activation scales."""
    act_scales = calibrate_cnn(variables, calib_images, widths)
    p = variables["params"]
    n_convs = 3 * len(widths)
    qweights, wscales = [], []
    for i in range(1, n_convs):  # Conv_0 (stem) stays fp
        kernel = jnp.asarray(p[f"Conv_{i}"]["kernel"], jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
        qweights.append(jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8))
        wscales.append(s_w)
    return QuantizedCNN(tuple(qweights), tuple(wscales), act_scales, variables, tuple(widths))


def quantized_forward(q: QuantizedCNN, x: jax.Array, int8_algo: str = "conv") -> jax.Array:
    """Int8 inference forward — same signature shape as ``model.apply``."""
    return functional_forward(q.fp, x, q.widths, quant=q, int8_algo=int8_algo)
