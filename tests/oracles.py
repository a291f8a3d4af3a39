"""Independent numpy oracles for the op-layer golden tests.

These implement the *documented semantics* of the reference ops (see
SURVEY.md section 2.1) directly with explicit loops / numpy primitives, so the
JAX/XLA implementations are checked against a second, independently-written
realization of the same spec.
"""

import numpy as np


def upfirdn2d_ref(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1.0):
    """Oracle for upfirdn2d on NHWC input.

    Steps (spec): zero-upsample (keeping up-1 trailing zeros), pad/crop,
    2D convolve (flip unless flip_filter), keep every down-th pixel.
    """
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    upx, upy = up
    downx, downy = down
    if isinstance(padding, int):
        padding = [padding] * 4
    elif len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    px0, px1, py0, py1 = padding

    if f is None:
        f = np.ones((1, 1), np.float32)
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        f = np.outer(f, f)

    x = np.asarray(x, np.float64)
    n, h, w, c = x.shape

    # Zero-upsample with trailing zeros.
    xu = np.zeros((n, h * upy, w * upx, c), np.float64)
    xu[:, ::upy, ::upx, :] = x

    # Pad (positive) then crop (negative).
    xp = np.pad(xu, ((0, 0), (max(py0, 0), max(py1, 0)),
                     (max(px0, 0), max(px1, 0)), (0, 0)))
    hh, ww = xp.shape[1], xp.shape[2]
    xp = xp[:, max(-py0, 0):hh - max(-py1, 0), max(-px0, 0):ww - max(-px1, 0), :]

    # Convolve (flip unless flip_filter), valid only.
    k = f * (gain)
    if not flip_filter:
        k = k[::-1, ::-1]
    fh, fw = k.shape
    oh = xp.shape[1] - fh + 1
    ow = xp.shape[2] - fw + 1
    out = np.zeros((n, oh, ow, c), np.float64)
    for i in range(fh):
        for j in range(fw):
            out += k[i, j] * xp[:, i:i + oh, j:j + ow, :]

    # Downsample.
    out = out[:, ::downy, ::downx, :]
    return out.astype(np.float32)


def conv2d_nhwc_ref(x, w, stride=1, pad=0):
    """Plain VALID correlation oracle, NHWC x HWIO, symmetric int padding."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    n, h, wd, ci = x.shape
    kh, kw, ci2, co = w.shape
    assert ci == ci2
    if pad:
        x = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (x.shape[1] - kh) // stride + 1
    ow = (x.shape[2] - kw) // stride + 1
    out = np.zeros((n, oh, ow, co), np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = x[:, i:i + oh * stride:stride, j:j + ow * stride:stride, :]
            out += np.einsum("nhwc,co->nhwo", patch, w[i, j])
    return out.astype(np.float32)


def modulated_conv2d_ref(x, weight, styles, demodulate=True, padding=0):
    """Per-sample fused-weights oracle (the reference 'fused path' spec):
    w'[b] = weight * styles[b] (per input channel), demodulated per output
    channel, then a plain conv per sample."""
    x = np.asarray(x, np.float64)
    weight = np.asarray(weight, np.float64)  # HWIO
    styles = np.asarray(styles, np.float64)
    b = x.shape[0]
    outs = []
    for bi in range(b):
        wb = weight * styles[bi][None, None, :, None]
        if demodulate:
            d = 1.0 / np.sqrt(np.sum(wb ** 2, axis=(0, 1, 2)) + 1e-8)
            wb = wb * d[None, None, None, :]
        outs.append(conv2d_nhwc_ref(x[bi:bi + 1], wb, pad=padding))
    return np.concatenate(outs, axis=0)
