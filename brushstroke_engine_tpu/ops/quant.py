"""Opt-in int8 quantized inference for the serving path.

TPU v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 MAC rate, and
XLA lowers int8 ``conv_general_dilated`` onto it for stride-1 shapes.
Measured on the flagship synthesis conv shapes (B=128, best of 3,
on-device loop, scripts/microbench_int8.py):

    conv                         bf16        int8
    128->128 s1 @128^2        5.14 ms / 120  3.71 ms / 167 TOPS   1.39x
    64->64   s1 @256^2        6.75 ms /  92  5.00 ms / 124 TOPS   1.35x
    64->128  s2 @256^2        5.62 ms /  55  6.64 ms /  47 TOPS   0.85x

Strided convs LOSE (XLA's int8 path does not cover them well), so the
gate covers only unstrided, undilated, ungrouped dense convs.

**Measured in-situ verdict: NEGATIVE -- kept as a documented
experiment, not a serving mode.**  Inside the full synthesis program
(scripts/microbench_render_parts.py --int8, back-to-back same-ambient
runs) the int8 path measures 32.8 ms vs 29.0 ms bf16 for the 256px
B=128 stack: the dynamic quantization costs two extra passes over the
activations per conv (the amax reduction and the round/clip int8
write) and breaks XLA's conv+bias+act epilogue fusions, which together
outweigh the 1.35-1.39x MXU win of the conv itself.  Recovering the
win would need static calibrated scales with quantize-on-write folded
into the previous layer's epilogue (removing both extra passes); until
then no production CLI exposes this flag.

Scheme: symmetric dynamic quantization.  Activations get a per-sample
scale (amax / 127 over each batch element -- the conv never mixes batch
elements, so scales stay per-sample exact); weights get a per-output-
channel scale.  The int32 accumulator is rescaled by the outer product
of the two, so the only error is the rounding of operands to 255
levels.  There is no calibration step and no stored quantized weights:
both quantizations happen inside the jitted program (the weight side
folds away at ~KB scale; the activation side costs one extra pass that
the halved conv read pays back).

Inference-only: the quantized conv defines no custom VJP on purpose --
training, projection, and CLIP/clarity optimization differentiate
through the generator and must keep the bf16 path.  Enable via
``set_int8_inference(True)`` (exposed as ``--int8`` on the server and
stylize CLIs).  Quality impact is measured, not assumed: see
tests/test_quant.py and the PARITY.md round-3 section for PSNR/LPIPS
of int8-vs-bf16 renders.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_ENABLED = False


def set_int8_inference(on: bool):
    global _ENABLED
    _ENABLED = bool(on)


def int8_inference_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def int8_inference(on: bool = True):
    global _ENABLED
    old = _ENABLED
    _ENABLED = bool(on)
    try:
        yield
    finally:
        _ENABLED = old


def quantizable(x, strides, lhs_dilation, groups) -> bool:
    """True when the int8 MXU path is profitable for this conv."""
    return (_ENABLED
            and groups == 1
            and tuple(strides) == (1, 1)
            and tuple(lhs_dilation) == (1, 1)
            and x.dtype in (jnp.bfloat16, jnp.float32)
            and x.ndim == 4)


def quantized_conv(x, w, padding):
    """int8 x int8 -> int32 dense NHWC conv with dynamic symmetric scales.

    x: [B,H,W,I] float; w: [kh,kw,I,O] float; returns x.dtype output.
    """
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)                       # [B,1,1,1]
    s_w = jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)                       # [1,1,1,O]
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_x * s_w)
    return y.astype(x.dtype)
