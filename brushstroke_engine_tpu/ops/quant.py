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

**Round-3 dynamic verdict: NEGATIVE.**  Inside the full synthesis
program (scripts/microbench_render_parts.py --int8, back-to-back
same-ambient runs) the DYNAMIC int8 path measures 32.8 ms vs 29.0 ms
bf16 for the 256px B=128 stack: the dynamic quantization costs two
extra passes over the activations per conv (the amax reduction and the
round/clip int8 write) and breaks XLA's conv+bias+act epilogue fusions.

**Round-4 static-calibration verdict: POSITIVE -- productionized.**
With per-call-site scales calibrated once (``calibration()`` /
``eager_calibrate``) and baked into the trace as constants
(``static_scales``), the amax pass disappears and the same stack
measures **23.8 ms vs 30.7 ms bf16 (1.29x)**
(scripts/microbench_render_parts.py --int8_static); the full serving
pipeline (encode + synthesis + composite, bench.py) measures
**3,525 vs 2,955 patches/s (1.19x)**.  Serving exposes it
as ``--int8 static`` on the server and stylize CLIs via
``engine.enable_int8_serving()`` (multi-pass calibration + 1.25x
headroom; PSNR>25 dB gates in tests/test_quant.py).  The scales ride
the jit cache key as a STATIC argument -- int8 and bf16 programs cache
separately (see engine/render.py:render_core).

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
    return ((_ENABLED or _CALIBRATING or _STATIC_SCALES is not None)
            and groups == 1
            and tuple(strides) == (1, 1)
            and tuple(lhs_dilation) == (1, 1)
            and x.dtype in (jnp.bfloat16, jnp.float32)
            and x.ndim == 4)


# --- Static-calibration PTQ (the round-4 follow-up experiment) ----------
#
# The dynamic scheme's in-situ loss was attributed to the per-conv amax
# reduction + the fusion break of the int8 round/clip write.  Static
# calibration removes the amax pass: run the engine EAGERLY on
# calibration inputs under ``calibration()`` (each quantizable call site
# records its activation amax by call order), then run inference under
# ``static_scales(scales)`` -- each call site's scale is baked into the
# jitted program as a CONSTANT (call order at trace time is
# deterministic), so the only remaining overhead is the round/clip
# write.  Per-tensor (not per-sample) scales: calibration takes the max
# over the calibration batch; quality measured in tests/test_quant.py.

_CALIBRATING = False
_CALIB_AMAX = []
_STATIC_SCALES = None
_TRACE_IDX = 0


@contextlib.contextmanager
def calibration():
    """Eager calibration pass: records per-call-site activation amax."""
    global _CALIBRATING, _CALIB_AMAX
    _CALIBRATING, old = True, _CALIBRATING
    _CALIB_AMAX = []
    try:
        yield _CALIB_AMAX
    finally:
        _CALIBRATING = old


def calibrated_scales():
    """amax list from the last calibration() pass -> per-site scales."""
    return [max(a / 127.0, 1e-12) for a in _CALIB_AMAX]


@contextlib.contextmanager
def static_scales(scales):
    """Run (and trace) with baked per-call-site constant activation
    scales, in recorded call order."""
    global _STATIC_SCALES, _TRACE_IDX
    _STATIC_SCALES, old = list(scales), _STATIC_SCALES
    _TRACE_IDX = 0
    try:
        yield
    finally:
        _STATIC_SCALES = old


def sites_consumed():
    """How many quantized call sites the last static_scales() trace
    consumed.  Public accessor for gate-regression checks (bench.py):
    0 after a trace means the int8 gate never engaged."""
    return _TRACE_IDX


def eager_calibrate(fn, *args, **kwargs):
    """Run ``fn`` once EAGERLY (jits disabled) under calibration and
    return the per-call-site scales its quantizable convs recorded."""
    with jax.disable_jit(), calibration():
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return calibrated_scales()


def static_ctx(scales):
    """``static_scales(scales)`` when scales are present, else a no-op —
    the per-call wrapper render paths use around their jit invocations
    (only traces consume scales; cached executions pass through)."""
    if scales:
        return static_scales(scales)
    return contextlib.nullcontext()


def quantized_conv(x, w, padding):
    """int8 x int8 -> int32 dense NHWC conv with symmetric scales.

    x: [B,H,W,I] float; w: [kh,kw,I,O] float; returns x.dtype output.
    Activation scale: per-sample dynamic amax by default; a baked
    per-tensor constant under ``static_scales`` (no amax pass); recorded
    (then dynamic) under ``calibration``.
    """
    global _TRACE_IDX
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    if _CALIBRATING:
        # Eager pass: record the concrete activation amax for this site.
        _CALIB_AMAX.append(float(jnp.max(jnp.abs(xf))))
    if _STATIC_SCALES is not None and not _CALIBRATING:
        if _TRACE_IDX >= len(_STATIC_SCALES):
            raise RuntimeError(
                f"static int8 scales exhausted at call site {_TRACE_IDX}; "
                "re-run calibration() on this program shape")
        s_x = jnp.float32(_STATIC_SCALES[_TRACE_IDX])   # baked constant
        _TRACE_IDX += 1
    else:
        s_x = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0
        s_x = jnp.maximum(s_x, 1e-12)                   # [B,1,1,1]
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
