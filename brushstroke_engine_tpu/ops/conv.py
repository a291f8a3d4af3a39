"""Convolution with fused resampling, and style-modulated convolution.

TPU-native equivalents of the reference composite ops
``conv2d_resample`` (thirdparty/.../torch_utils/ops/conv2d_resample.py:59-156)
and ``modulated_conv2d`` (thirdparty/.../training/networks.py:31-88).

Layout: activations NHWC, weights HWIO.  All dense convs accumulate in
float32 on the MXU via ``preferred_element_type``.

Design notes (why this is not a port):

* ``conv2d_resample``: the reference dispatches across five CUDA fast paths.
  Here there are three XLA forms -- up>1 becomes ONE dense conv with
  ``lhs_dilation`` (XLA's native transposed conv) followed by the depthwise
  FIR conv; down>1 becomes depthwise FIR then a strided dense conv; the plain
  case is a single conv with explicit (possibly negative) padding.  All are
  algebraically identical to the reference composition (VALID convolutions
  commute), and XLA autodiff supplies the arbitrary-order gradients the
  reference needed ``conv2d_gradfix`` for.

* ``modulated_conv2d``: the reference's "fused" path builds per-sample weights
  and runs a grouped conv with ``groups=batch`` -- efficient on CUDA, hostile
  to the 128x128 MXU (batch-many tiny matmuls).  We instead always use the
  mathematically-identical activation-scaling form (reference networks.py:
  66-76): scale input channels by the style, run ONE shared dense conv, scale
  output channels by the demodulation coefficient.  Input-channel scaling
  commutes with the conv sum and the per-output-channel scale commutes with
  the depthwise FIR, so results match the fused path exactly (up to float
  associativity) while the MXU sees a single large matmul.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.ops.upfirdn import (
    _filter_2d,
    _parse_padding,
    upfirdn2d,
)


def _dense_conv(x, w, strides=(1, 1), padding=((0, 0), (0, 0)),
                lhs_dilation=(1, 1), groups: int = 1):
    from brushstroke_engine_tpu.ops.quant import quantizable, quantized_conv
    if quantizable(x, strides, lhs_dilation, groups):
        return quantized_conv(x, w.astype(x.dtype), padding)
    from brushstroke_engine_tpu.ops.precision import conv_precision
    precision = conv_precision(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
        # bf16 convs accumulate in f32 in the MXU already; requesting an f32
        # output dtype breaks the conv transpose rule under grad (dtype
        # mismatch dY vs W), so only force it for f32 inputs.
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32
        else None,
    )
    return out.astype(x.dtype)


def conv2d_resample(x, w, f=None, up: int = 1, down: int = 1, padding=0,
                    groups: int = 1, flip_weight: bool = True,
                    flip_filter: bool = False):
    """2D convolution with optional FIR-filtered up/downsampling.

    Padding is with respect to the (conceptually) upsampled image, exactly as
    in the reference (conv2d_resample.py:59).

    Args:
      x: ``[N, H, W, I]``.
      w: ``[kh, kw, I // groups, O]`` (HWIO).
      f: FIR filter from :func:`setup_filter` (used only when up>1 or down>1).
      flip_weight: True = correlation (torch conv2d convention), False = conv.
      flip_filter: False = convolution, True = correlation.
    """
    kh, kw = int(w.shape[0]), int(w.shape[1])
    f2 = _filter_2d(f)
    fh, fw = int(f2.shape[0]), int(f2.shape[1])
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding to account for up/downsampling (conv2d_resample.py:97-107).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # lax conv performs correlation; torch conv2d (flip_weight=True) also
    # correlates, so flip only when flip_weight=False.
    if not flip_weight:
        w = w[::-1, ::-1]

    if up > 1:
        # Dense conv over the zero-dilated input (= transposed conv), then the
        # FIR smoothing filter with gain up^2.  When down>1 the reference runs
        # a SECOND zero-padding FIR pass for anti-aliasing
        # (conv2d_resample.py:143-145) rather than fusing down into the first.
        x = _dense_conv(
            x, w,
            padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
            lhs_dilation=(up, up),
            groups=groups)
        x = upfirdn2d(x, f, gain=up ** 2, flip_filter=flip_filter)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        # FIR anti-aliasing filter (with all padding), then strided dense conv.
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter)
        x = _dense_conv(x, w, strides=(down, down), groups=groups)
        return x

    # Plain conv; XLA supports negative explicit padding (= cropping).
    return _dense_conv(x, w, padding=((py0, py1), (px0, px1)), groups=groups)


def modulated_conv2d(
    x,                       # [B, H, W, I] input.
    weight,                  # [kh, kw, I, O] conv weight.
    styles,                  # [B, I] per-sample modulation.
    noise=None,              # Optional [B, H', W', 1] (or [B,H',W',O]) noise.
    up: int = 1,
    down: int = 1,
    padding=0,
    resample_filter=None,
    demodulate: bool = True,
    flip_weight: bool = True,
):
    """Style-modulated conv2d (StyleGAN2 core op).

    Matches reference ``modulated_conv2d`` (networks.py:31-88) for both its
    fused and non-fused paths (which are themselves equivalent); see module
    docstring for the TPU-first execution strategy.
    """
    b = x.shape[0]
    kh, kw, in_ch, out_ch = weight.shape
    assert styles.shape == (b, in_ch)

    w32 = weight.astype(jnp.float32)
    s32 = styles.astype(jnp.float32)

    # Low-precision overflow guard (reference networks.py:51-53): keep the
    # modulated weights in a sane range before the conv.  bf16 has fp32's
    # exponent range so overflow is not a real risk, but normalizing keeps
    # activation scales comparable to the fp32 reference.
    if x.dtype in (jnp.float16, jnp.bfloat16) and demodulate:
        w_norm = jnp.max(jnp.abs(w32), axis=(0, 1, 2), keepdims=True)  # [1,1,1,O]
        w32 = w32 / (jnp.sqrt(in_ch * kh * kw) * w_norm)
        s32 = s32 / jnp.max(jnp.abs(s32), axis=1, keepdims=True)

    dcoefs = None
    if demodulate:
        # dcoef[b,o] = rsqrt(sum_{i,k,l} (w[k,l,i,o] * s[b,i])^2 + 1e-8);
        # the reduction over k,l collapses into a [I,O] matrix so the whole
        # thing is one small MXU matmul instead of a [B,O,I,k,k] reduction.
        wsq = jnp.sum(jnp.square(w32), axis=(0, 1))          # [I, O]
        ssq = jnp.square(s32)                                # [B, I]
        dcoefs = jax.lax.rsqrt(ssq @ wsq + 1e-8)             # [B, O]

    x = x * s32[:, None, None, :].astype(x.dtype)
    x = conv2d_resample(x, w32.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=padding, flip_weight=flip_weight)
    if demodulate and noise is not None:
        x = x * dcoefs[:, None, None, :].astype(x.dtype) + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs[:, None, None, :].astype(x.dtype)
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
