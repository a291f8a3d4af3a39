"""Training-time stitching: render two overlapping crops consistently and
compose them across the seam for stitching losses.

Rebuild of the reference RandomStitcher (forger/train/stitching.py:194-267).

TPU-first reshaping: the reference composites with dynamic-size slice
assignment; under jit all shapes must be static, so compositing is expressed
with coordinate masks + dynamic-shift translation, and the overlap patches
fed to patch losses are a FIXED ``min_overlap``-sized window inside the
overlap (the stitcher guarantees at least that much overlap), extracted with
``lax.dynamic_slice``.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.engine.areas import gen_overlapping_square_crop
from brushstroke_engine_tpu.models.generator import generator_apply


def translate_image(img, dy, dx):
    """Shift [B,H,W,C] content by (dy, dx) with zero fill, traced offsets."""
    b, h, w, c = img.shape
    # Roll, then mask out the wrapped-around region (zero fill).
    rolled = jnp.roll(img, shift=(dy, dx), axis=(1, 2))
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    valid_y = jnp.where(dy >= 0, ys >= dy, ys < h + dy)
    valid_x = jnp.where(dx >= 0, xs >= dx, xs < w + dx)
    mask = jnp.logical_and(valid_y, valid_x).astype(img.dtype)[..., None]
    return rolled * mask


def rect_mask(h, w, rstart, rend, cstart, cend, dtype=jnp.float32):
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    m = (ys >= rstart) & (ys < rend) & (xs >= cstart) & (xs < cend)
    return m.astype(dtype)


def composite_shifted(fake1, fake2, area1, delta):
    """Paste (a translated view of) fake2 into fake1 over area1.

    area1 = (rstart, rend, cstart, cend) traced ints in fake1 coordinates;
    delta = (dy, dx) traced translation aligning fake2's frame to fake1's.
    """
    h, w = fake1.shape[1:3]
    aligned = translate_image(fake2, delta[0], delta[1])
    m = rect_mask(h, w, *area1, dtype=fake1.dtype)[None, :, :, None]
    return fake1 * (1 - m) + aligned * m


@dataclass
class RandomStitcher:
    """Generates overlapping crops + cross-composited fakes
    (reference stitching.py:194-267)."""

    crop_margin: int = 10
    min_overlap: int = 50

    def gen_overlapping_square_crop(self, input_width, crop1, rng=None):
        return gen_overlapping_square_crop(input_width, crop1,
                                           self.crop_margin,
                                           self.min_overlap, rng)

    def generate_with_stitching(self, gen_cfg, g_params, g_state, z,
                                geom_feature1, geom_feature2,
                                crop1, crop2, rng,
                                positions1=None) -> Dict:
        """Run G on two overlapping crops with consistent canvas positions and
        cross-composite the results.

        crop1/crop2: (row, col, h, w) int arrays -- TRACED values are fine;
        all area algebra below is jnp scalar arithmetic, the crop width is the
        only static quantity (always the training resolution), and the
        stitcher's min_overlap guarantee makes the patch window size static.

        Note: the reference indexes the pasted image with coordinates
        relative to the margin-OFFSET crop (reference stitching.py:246-252),
        shifting pasted content by crop_margin pixels; we implement the
        evident intent -- aligned compositing over the margin-shrunk overlap.
        """
        img_resolution = gen_cfg.img_resolution
        batch = z.shape[0]
        k_pos, k_g1, k_g2 = jax.random.split(rng, 3)

        crop1 = jnp.asarray(crop1)
        crop2 = jnp.asarray(crop2)
        width = int(gen_cfg.img_resolution)  # crop h == w == train resolution

        if positions1 is None:
            positions1 = jax.random.randint(
                k_pos, (batch, 2), 0, img_resolution - 1)
        delta = jnp.stack([crop2[0] - crop1[0], crop2[1] - crop1[1]])
        positions2 = positions1 + delta[None, :]

        def run(feats, positions, k):
            img, _, _ = generator_apply(
                gen_cfg, g_params, g_state, z=z, geom_features=feats,
                positions=positions, noise_mode="const", rng=k,
                style_mixing_prob=0.0)
            return img

        fake1 = run(geom_feature1, positions1, k_g1)
        fake2 = run(geom_feature2, positions2, k_g2)

        def overlap_rel(base, other, margin):
            """Overlap of base-crop with margin-shrunk other-crop, relative to
            base's frame: (rstart, rend, cstart, cend) traced ints."""
            rs = jnp.maximum(base[0], other[0] + margin) - base[0]
            cs = jnp.maximum(base[1], other[1] + margin) - base[1]
            re = jnp.minimum(base[0] + width,
                             other[0] + width - margin) - base[0]
            ce = jnp.minimum(base[1] + width,
                             other[1] + width - margin) - base[1]
            return rs, re, cs, ce

        m = self.crop_margin
        a1 = overlap_rel(crop1, crop2, m)
        fake1_composite = composite_shifted(
            fake1, fake2, a1, (crop2[0] - crop1[0], crop2[1] - crop1[1]))

        b2 = overlap_rel(crop2, crop1, m)
        fake2_composite = composite_shifted(
            fake2, fake1, b2, (crop1[0] - crop2[0], crop1[1] - crop2[1]))

        # Fixed-size aligned windows of the SAME canvas region for the patch
        # losses (size = min_overlap, guaranteed by crop generation; at
        # resolutions below min_overlap the window is the whole crop).
        pw = min(int(self.min_overlap), width)
        abs_rs = jnp.maximum(crop1[0] + m, crop2[0])
        abs_cs = jnp.maximum(crop1[1] + m, crop2[1])
        p1_r = jnp.clip(abs_rs - crop1[0], 0, width - pw)
        p1_c = jnp.clip(abs_cs - crop1[1], 0, width - pw)
        p2_r = jnp.clip(abs_rs - crop2[0], 0, width - pw)
        p2_c = jnp.clip(abs_cs - crop2[1], 0, width - pw)
        patch1 = jax.lax.dynamic_slice(
            fake1, (0, p1_r, p1_c, 0), (batch, pw, pw, fake1.shape[-1]))
        patch2 = jax.lax.dynamic_slice(
            fake2, (0, p2_r, p2_c, 0), (batch, pw, pw, fake2.shape[-1]))

        return {
            "fake1": fake1,
            "fake2": fake2,
            "fake1_composite": fake1_composite,
            "fake2_composite": fake2_composite,
            "positions1": positions1,
            "positions2": positions2,
            "patch1": patch1,
            "patch2": patch2,
        }
