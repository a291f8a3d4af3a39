"""Batch stylization of line drawings: tile an any-size image into
overlapping patches, render each with the paint engine (feature blending
across seams), and assemble an RGBA canvas.

Rebuild of the reference stylization path:
  * generate_stitching_crops (forger/viz/style_transfer.py:15-48)
  * paint_image_main CLI     (forger/viz/paint_image_main.py:104-193)

TPU-first notes: patches are rendered through the same jitted render core as
the interactive path, and independent tiles can be batched (``batch_size``)
when feature blending is off; with blending on, tiles run in scan order since
each tile reads features written by its neighbors (matching the reference's
sequential semantics).
"""

from __future__ import annotations

import logging
import math
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def generate_stitching_crops(img_shape: Tuple[int, int], patch_width: int,
                             overlap_margin: int, geom: np.ndarray = None,
                             mode: str = "all") -> List[Tuple[int, int, int, int]]:
    """Grid of overlapping (y, x, h, w) crops covering the image.

    Stride = patch_width - 2 * overlap_margin; the last row/col is clamped so
    crops stay inside the (pre-padded) image.  mode='nonempty' skips crops
    whose geometry patch contains no stroke pixels.
    """
    rows, cols = img_shape[:2]
    stride = patch_width - 2 * overlap_margin
    crops = []
    ys = list(range(0, max(rows - 2 * overlap_margin - 1, 1), stride))
    xs = list(range(0, max(cols - 2 * overlap_margin - 1, 1), stride))
    for y in ys:
        y = min(y, rows - patch_width)
        for x in xs:
            x = min(x, cols - patch_width)
            if mode == "nonempty" and geom is not None:
                patch = geom[y:y + patch_width, x:x + patch_width]
                if float(patch.min()) > 0.5:
                    continue
            crops.append((y, x, patch_width, patch_width))
    return crops


def pad_geometry(geom: np.ndarray, patch_width: int,
                 overlap_margin: int) -> Tuple[np.ndarray, int]:
    """Pad a geometry image (1.0 = BG) so the crop grid covers it exactly."""
    rows, cols = geom.shape[:2]
    stride = patch_width - 2 * overlap_margin
    new_rows = max(patch_width,
                   int(math.ceil((rows - 2 * overlap_margin) / stride))
                   * stride + 2 * overlap_margin)
    new_cols = max(patch_width,
                   int(math.ceil((cols - 2 * overlap_margin) / stride))
                   * stride + 2 * overlap_margin)
    out = np.ones((new_rows, new_cols), geom.dtype)
    out[:rows, :cols] = geom
    return out, stride


def read_geometry_image(img: np.ndarray, binarize: bool = True
                        ) -> np.ndarray:
    """Any-format image -> float geometry (1 = BG, 0 = stroke)
    (reference _read_any_geo, paint_image_main.py:30-57)."""
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 4:
        gray = 1.0 - arr[..., 3].astype(np.float32) / 255.0
    elif arr.ndim == 3:
        gray = arr[..., :3].astype(np.float32).mean(-1) / 255.0
    else:
        gray = arr.astype(np.float32)
        if gray.max() > 1.5:
            gray = gray / 255.0
    if binarize:
        from brushstroke_engine_tpu.utils.img_proc import threshold_otsu
        t = threshold_otsu(gray)
        gray = (gray > t).astype(np.float32)
    return gray


def stylize_image(helper, geom: np.ndarray, brush_options, *,
                  overlap_margin: int = 10, crop_margin: int = 10,
                  feature_blending_level: int = 2,
                  on_white: bool = False,
                  mode: str = "all") -> np.ndarray:
    """Render a full line drawing with a brush style.

    Args:
      helper: a PaintingHelper bound to a paint engine.
      geom: [H, W] float geometry, 1 = background.
      brush_options: GanBrushOptions with the style set.

    Returns:
      [H', W', 4] uint8 RGBA stylized canvas (padded size).
    """
    patch_width = helper.engine.patch_width
    geom, _ = pad_geometry(geom, patch_width, overlap_margin)
    rows, cols = geom.shape

    helper.make_new_canvas(rows, cols,
                           feature_blending=feature_blending_level)
    crops = generate_stitching_crops((rows, cols), patch_width,
                                     overlap_margin, geom=geom, mode=mode)
    canvas = np.zeros((rows, cols, 4), np.uint8)

    for (y, x, h, w) in crops:
        patch = geom[y:y + h, x:x + w]
        stroke_patch = np.zeros((h, w, 4), np.uint8)
        stroke_patch[..., 3] = ((1.0 - patch) * 255).astype(np.uint8)
        brush_options.set_position(x, y)
        img, _, meta = helper.render_stroke(
            stroke_patch, None, brush_options,
            meta={"x": x, "y": y, "crop_margin": crop_margin})
        oy, ox = meta["y"], meta["x"]
        hh, ww = img.shape[:2]
        canvas[oy:oy + hh, ox:ox + ww] = img

    if on_white:
        alpha = canvas[..., 3:4].astype(np.float32) / 255.0
        rgb = canvas[..., :3].astype(np.float32) * alpha + 255.0 * (1 - alpha)
        canvas = np.concatenate(
            [np.clip(rgb, 0, 255).astype(np.uint8),
             np.full_like(canvas[..., 3:4], 255)], axis=-1)
    return canvas
