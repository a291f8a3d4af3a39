"""Color-space conversions and Lab color-control metrics.

Rebuild of the reference color utilities (forger/util/color.py: srgb -> linear
-> XYZ -> Lab chain) and the Lab metrics (forger/metrics/color_metric.py:
LAB_E% = percent of foreground pixels whose Lab distance to the user color
exceeds the just-noticeable-difference threshold, LAB_L2 = mean masked Lab
distance).  NHWC layouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# D65 white point, standard sRGB matrices.
_RGB2XYZ = np.array([
    [0.412453, 0.212671, 0.019334],
    [0.357580, 0.715160, 0.119193],
    [0.180423, 0.072169, 0.950227],
], np.float32)  # column-multiplied: xyz = rgb @ _RGB2XYZ
_WHITE = np.array([0.950456, 1.0, 1.088754], np.float32)


def srgb_to_linear(srgb):
    srgb = jnp.clip(srgb, 0.0, 1.0)
    return jnp.where(srgb <= 0.04045, srgb / 12.92,
                     ((srgb + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(rgb):
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return jnp.where(rgb <= 0.0031308, rgb * 12.92,
                     1.055 * rgb ** (1.0 / 2.4) - 0.055)


def rgb2lab(rgb):
    """sRGB [.., 3] in [0, 1] -> CIELAB [.., 3] (L in [0,100])."""
    lin = srgb_to_linear(rgb)
    xyz = lin @ jnp.asarray(_RGB2XYZ)
    xyz = xyz / jnp.asarray(_WHITE)

    eps = 6.0 / 29.0

    def f(t):
        return jnp.where(t > eps ** 3, jnp.cbrt(t),
                         t / (3 * eps ** 2) + 4.0 / 29.0)

    fx, fy, fz = f(xyz[..., 0]), f(xyz[..., 1]), f(xyz[..., 2])
    l = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([l, a, b], axis=-1)


def compute_lab_deltas(target_colors, renders, ignore_transparency=False):
    """Per-pixel Lab distance to the target stroke color.

    Args:
      target_colors: ``[B, 3]`` float [0,1] user colors.
      renders: ``[B, W, W, 4]`` RGBA float [0,1].
    """
    if ignore_transparency:
        rgb = renders[..., :3]
    else:
        alpha = renders[..., 3:4]
        rgb = alpha * renders[..., :3] + (1 - alpha)  # over white canvas
    lab_img = rgb2lab(rgb)
    lab_target = rgb2lab(target_colors)[:, None, None, :]
    return jnp.linalg.norm(lab_img - lab_target, axis=-1)


def compute_lab_metrics(target_colors, renders, geom, lab_thresh=10.0,
                        ignore_transparency=False):
    """LAB_E% / LAB_L2 over stroke-foreground pixels
    (reference color_metric.py:52-75; JND 10 per ColorTriads SIGG2020)."""
    deltas = compute_lab_deltas(target_colors, renders,
                                ignore_transparency=ignore_transparency)
    masks = (1.0 - geom[..., 0])                        # [B, W, W], 1 = FG
    fg_pixels = jnp.clip(jnp.sum(masks, axis=(1, 2)), 1, None)
    mean_delta = jnp.mean(masks * deltas, axis=(1, 2))
    e_percent = jnp.sum((deltas > lab_thresh) * masks,
                        axis=(1, 2)) / fg_pixels * 100.0
    return {"LAB_E%": float(jnp.mean(e_percent)),
            "LAB_L2": float(jnp.mean(mean_delta))}
