"""Stroke-quality metrics: transparency, stitching, background uniformity.

Rebuild of the reference geometry metrics (forger/metrics/geom_metric.py):
  * compute_transparency_metrics (:143): BG_CLARITY_MEAN = 1 - mean alpha
    over blurred-confident-background pixels; FG_OPACITY_MEDIAN.
  * compute_stitching_metrics (:165): LPIPS/L1 between fakes and their
    cross-composites (seam quality).
  * compute_lpips_across_geo (:190): style stability across geometry.
  * compute_uniform_bg_lpips_metric (:207): masked patch-pair LPIPS over
    background regions.

NHWC layouts; reductions over boolean regions use mask arithmetic so they
run under jit with static shapes (medians fall back to masked quantile).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from brushstroke_engine_tpu.metrics.lpips import lpips_batched

BG_THRESH = 0.999
FG_THRESH = 0.3


def gaussian_smoothing(img, kernel_size: int = 5, sigma: float = 1.0):
    """Depthwise gaussian blur (reference GaussianSmoothing, :59)."""
    xs = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    k1 = np.exp(-0.5 * (xs / sigma) ** 2)
    k2 = np.outer(k1, k1)
    k2 /= k2.sum()
    c = img.shape[-1]
    kernel = jnp.broadcast_to(jnp.asarray(k2, img.dtype)[:, :, None, None],
                              (kernel_size, kernel_size, 1, c))
    pad = kernel_size // 2
    return jax.lax.conv_general_dilated(
        img, kernel, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=jnp.float32
    ).astype(img.dtype)


def get_conservative_fg_bg(geom):
    """Double-blurred conservative FG/BG masks (reference :132-140)."""
    blur = gaussian_smoothing(gaussian_smoothing(geom))
    return blur < 0.1, blur >= BG_THRESH


def _masked_mean(x, mask):
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.clip(jnp.sum(m), 1, None)


def _masked_median(x, mask):
    """Median of x where mask, via sort with +inf padding (static shape)."""
    flat = jnp.where(mask.reshape(-1), x.reshape(-1), jnp.inf)
    n = jnp.sum(mask).astype(jnp.int32)
    sorted_x = jnp.sort(flat)
    idx = jnp.clip((n - 1) // 2, 0, flat.shape[0] - 1)
    return sorted_x[idx]


def compute_transparency_metrics(renders, geom) -> Dict[str, float]:
    """renders: [B, W, W, 4] in [0,1]; geom: [B, W, W, 1], 0 = FG."""
    alphas = renders[..., 3]
    geom_blur = gaussian_smoothing(gaussian_smoothing(geom))[..., 0]
    g = geom[..., 0]
    bg_clarity = 1.0 - float(_masked_mean(alphas, geom_blur > BG_THRESH))
    fg_opacity = float(_masked_median(alphas, g < FG_THRESH))
    return {"BG_CLARITY_MEAN": bg_clarity, "FG_OPACITY_MEDIAN": fg_opacity}


def compute_stitching_metrics(stitching_result, margin: int
                              ) -> Dict[str, float]:
    """Seam quality between fakes and cross-composites ([B,H,W,C] NHWC)."""

    def crop(img):
        if margin == 0:
            return img
        return img[:, margin:img.shape[1] - 2 * margin,
                   margin:img.shape[2] - 2 * margin]

    def pair(im1, im2):
        return (float(jnp.mean(lpips_batched(crop(im1), crop(im2)))),
                float(jnp.mean(jnp.abs(crop(im1) - crop(im2)))))

    lp1, l11 = pair(stitching_result["fake1"],
                    stitching_result["fake1_composite"])
    lp2, l12 = pair(stitching_result["fake2"],
                    stitching_result["fake2_composite"])
    return {"STITCH_LPIPS": 0.5 * (lp1 + lp2),
            "STITCH_L1": 0.5 * (l11 + l12)}


def composite_over_white(renders):
    alpha = renders[..., 3:4]
    return alpha * renders[..., :3] + (1.0 - alpha)


def compute_lpips_across_geo(renders, rng=None) -> Dict[str, float]:
    """Perceptual spread of one style across geometries (reference :190)."""
    rgb = composite_over_white(renders) * 2.0 - 1.0
    if rng is None:
        rng = jax.random.PRNGKey(0)
    perm = jax.random.permutation(rng, renders.shape[0])
    scores = lpips_batched(rgb, rgb[perm])
    return {"LPIPS_ACROSS_GEO": float(jnp.mean(scores))}


def compute_uniform_bg_lpips_metric(renders, geom, patch_width=None,
                                    same_style: bool = False, rng=None,
                                    key_suffix: Optional[str] = None
                                    ) -> Dict[str, float]:
    """Background-uniformity LPIPS over random background patches
    (reference :207-260).  Patches whose background fraction is too low are
    excluded from the mean via masking."""
    key = "LPIPS_UNIFORM_BG" + (f"_{key_suffix}" if key_suffix else "")
    b, h, w, _ = renders.shape
    if patch_width is None:
        patch_width = w // 4
        if patch_width < 64:
            patch_width = w // 2
        if patch_width < 64:
            patch_width = int(0.8 * w)
        patch_width = min(patch_width, w)

    rgb = composite_over_white(renders) * 2.0 - 1.0
    geom_blur = gaussian_smoothing(geom)
    bg_mask = (geom_blur[..., 0] > 0.99).astype(jnp.float32)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)

    def rand_patch(k, arr):
        y = jax.random.randint(k, (), 0, h - patch_width + 1)
        x = jax.random.randint(jax.random.fold_in(k, 1), (), 0,
                               w - patch_width + 1)
        return jax.lax.dynamic_slice(
            arr, (0, y, x) + (0,) * (arr.ndim - 3),
            (arr.shape[0], patch_width, patch_width) + arr.shape[3:])

    p0 = rand_patch(k1, rgb)
    m0 = rand_patch(k1, bg_mask[..., None])
    if same_style:
        perm = jax.random.permutation(k3, b)
        p1 = rand_patch(k2, rgb)[perm]
        m1 = rand_patch(k2, bg_mask[..., None])[perm]
    else:
        p1 = rand_patch(k2, rgb)
        m1 = rand_patch(k2, bg_mask[..., None])

    # Only compare patches that are mostly background in both positions.
    frac0 = jnp.mean(m0, axis=(1, 2, 3))
    frac1 = jnp.mean(m1, axis=(1, 2, 3))
    valid = ((frac0 > 0.6) & (frac1 > 0.6)).astype(jnp.float32)
    scores = lpips_batched(p0, p1)
    mean = jnp.sum(scores * valid) / jnp.clip(jnp.sum(valid), 1, None)
    return {key: float(mean)}
