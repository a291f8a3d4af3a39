"""Fused pad -> zero-upsample -> FIR filter -> downsample for 2D images.

TPU-native equivalent of the reference CUDA kernel
(reference: thirdparty/stylegan2_ada_pytorch/torch_utils/ops/upfirdn2d.{cu,py};
executable spec `_upfirdn2d_ref` at upfirdn2d.py:169).

The whole pipeline is ONE ``lax.conv_general_dilated`` call:

  * zero-upsampling  -> ``lhs_dilation=(upy, upx)``
  * border padding   -> explicit ``padding`` (negative values crop; XLA
                        supports negative conv padding natively)
  * FIR filtering    -> depthwise conv (``feature_group_count=C``)
  * downsampling     -> ``window_strides=(downy, downx)``

XLA lowers this to a single fused TPU kernel, with forward/transposed forms
generated automatically for arbitrary-order autodiff -- the reference needed a
hand-written transposed-upfirdn backward (upfirdn2d.py:246-264); here it falls
out of the conv VJP.

Layout: activations are NHWC (TPU-native), filters are [fh, fw] numpy/jnp.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np



def _parse_scaling(scaling):
    if isinstance(scaling, int):
        return scaling, scaling
    sx, sy = scaling
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = [int(p) for p in padding]
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _filter_2d(f) -> np.ndarray:
    """Normalize a filter argument to a 2D float32 array (no DC normalization)."""
    if f is None:
        return np.ones((1, 1), dtype=np.float32)
    f = np.asarray(f, dtype=np.float32) if not isinstance(f, jnp.ndarray) else f
    if f.ndim == 1:
        # Separable taps: materialize the rank-1 outer product (see filters.py).
        f = np.outer(np.asarray(f, np.float32), np.asarray(f, np.float32)) \
            if isinstance(f, np.ndarray) else jnp.outer(f, f)
    assert f.ndim == 2
    return f


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter: bool = False,
              gain: float = 1.0):
    """Pad, upsample, FIR-filter, and downsample a batch of NHWC images.

    Per channel: (1) insert ``up-1`` zeros after each pixel, (2) pad by
    ``padding`` zeros per side w.r.t. the upsampled image (negative = crop),
    (3) convolve with ``f`` keeping only fully-covered outputs, (4) keep every
    ``down``-th pixel.  Matches the reference op including its convention that
    the upsampled image has ``up-1`` trailing zeros on each axis.

    Args:
      x: ``[N, H, W, C]`` float tensor.
      f: float32 FIR filter ``[fh, fw]``, separable taps ``[taps]``, or None.
      up / down: int or (x, y) int pair.
      padding: int, ``[x, y]``, or ``[x0, x1, y0, y1]`` w.r.t. upsampled image.
      flip_filter: False = convolution, True = correlation.
      gain: overall magnitude scaling.

    Returns:
      ``[N, H', W', C]`` tensor, same dtype as ``x``.
    """
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    f = _filter_2d(f)
    fh, fw = int(f.shape[0]), int(f.shape[1])

    # conv_general_dilated computes correlation; flip for convolution.
    if not flip_filter:
        f = f[::-1, ::-1]
    f = f * gain

    n, h, w, c = x.shape
    # lhs_dilation inserts zeros BETWEEN pixels; the reference keeps `up-1`
    # trailing zeros per axis, so fold them into the high-side padding.
    pad = ((py0, py1 + (upy - 1)), (px0, px1 + (upx - 1)))

    kernel = jnp.broadcast_to(
        jnp.asarray(f, dtype=x.dtype)[:, :, None, None], (fh, fw, 1, c))
    from brushstroke_engine_tpu.ops.precision import conv_precision
    precision = conv_precision(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=pad,
        lhs_dilation=(upy, upx),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=precision,
        # See ops/conv.py: f32 accumulation is implicit for bf16 on TPU, and
        # an explicit f32 output dtype breaks the transpose rule under grad.
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32
        else None,
    )
    return out.astype(x.dtype)


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """FIR-filter NHWC images; output shape matches input by default.

    Reference: torch_utils/ops/upfirdn2d.py:272-305.
    """
    px0, px1, py0, py1 = _parse_padding(padding)
    f2 = _filter_2d(f)
    fh, fw = int(f2.shape[0]), int(f2.shape[1])
    p = [px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """Upsample NHWC images with FIR smoothing; output = input * up.

    Reference: torch_utils/ops/upfirdn2d.py:308-344.
    """
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    f2 = _filter_2d(f)
    fh, fw = int(f2.shape[0]), int(f2.shape[1])
    p = [px0 + (fw + upx - 1) // 2, px1 + (fw - upx) // 2,
         py0 + (fh + upy - 1) // 2, py1 + (fh - upy) // 2]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """Downsample NHWC images with FIR anti-aliasing; output = input / down.

    Reference: torch_utils/ops/upfirdn2d.py:347-384.
    """
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    f2 = _filter_2d(f)
    fh, fw = int(f2.shape[0]), int(f2.shape[1])
    p = [px0 + (fw - downx + 1) // 2, px1 + (fw - downx) // 2,
         py0 + (fh - downy + 1) // 2, py1 + (fh - downy) // 2]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter,
                     gain=gain)
