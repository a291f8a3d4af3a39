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
from typing import List, Tuple

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
        canvas = composite_on_white(canvas)
    return canvas


def composite_on_white(canvas: np.ndarray) -> np.ndarray:
    alpha = canvas[..., 3:4].astype(np.float32) / 255.0
    rgb = canvas[..., :3].astype(np.float32) * alpha + 255.0 * (1 - alpha)
    return np.concatenate(
        [np.clip(rgb, 0, 255).astype(np.uint8),
         np.full_like(canvas[..., 3:4], 255)], axis=-1)


def stylize_image_batched(engine, geom: np.ndarray, brush_options, *,
                          overlap_margin: int = 10, crop_margin: int = 10,
                          feature_blending_level: int = 2,
                          batch_size: int = 16,
                          on_white: bool = False,
                          mode: str = "all") -> np.ndarray:
    """TPU-batched canvas stylization using checkerboard waves.

    The reference renders tiles strictly sequentially because each tile reads
    features written by earlier overlapping tiles (SURVEY.md section 3.3).
    On TPU we exploit the dependency structure: with stride >= patch/2,
    tiles in the same (row%2, col%2) parity class never overlap EACH OTHER,
    so each of the 4 waves renders as one large device batch; cross-wave
    blending still flows through the feature canvas.  This turns ~250
    sequential patch dispatches for a 2000x2000 canvas into 4 batched waves.
    """
    import jax.numpy as jnp
    from brushstroke_engine_tpu.engine import areas
    from brushstroke_engine_tpu.engine.canvas import FeatureCanvas

    patch_width = engine.patch_width
    stride = patch_width - 2 * overlap_margin
    assert stride * 2 >= patch_width, \
        "checkerboard waves need overlap_margin <= patch_width/4"
    geom, _ = pad_geometry(geom, patch_width, overlap_margin)
    rows, cols = geom.shape
    crops = generate_stitching_crops((rows, cols), patch_width,
                                     overlap_margin, geom=geom, mode=mode)
    canvas = np.zeros((rows, cols, 4), np.uint8)

    blending = feature_blending_level > 0
    fcanvas = None
    blend_res = None
    blend_margin = 16
    if blending:
        down = 2 ** (feature_blending_level - 1)
        fcanvas = FeatureCanvas(rows, cols, down_factor=down)
        blend_res = patch_width // down
        feat_ch = engine.gen_cfg.synthesis.channels(blend_res)
        fcanvas._init_canvases(np.zeros((1, 1, 1, feat_ch), np.float32))

    waves = {}
    for (y, x, h, w) in crops:
        key = ((y // stride) % 2, (x // stride) % 2)
        waves.setdefault(key, []).append((y, x, h, w))

    for key in sorted(waves):
        tiles = waves[key]
        for start in range(0, len(tiles), batch_size):
            chunk = tiles[start:start + batch_size]
            n = len(chunk)
            geom_b = np.stack([
                geom[y:y + h, x:x + w] for (y, x, h, w) in chunk]
            )[..., None].astype(np.float32)
            brush_options.set_position(
                np.asarray([x for (_y, x, _h, _w) in chunk]),
                np.asarray([y for (y, _x, _h, _w) in chunk]))
            brush_options.prepare_style(n)

            blended = None
            return_features = ()
            upd_masks = []
            if blending:
                feats_list, alpha_list = [], []
                bm = blend_margin // fcanvas.down_factor
                cm = crop_margin // fcanvas.down_factor
                for (y, x, h, w) in chunk:
                    area = fcanvas.down_area(areas.make_area(y, x, h, w))
                    mask, feats = fcanvas.get_features(area)
                    alpha = np.zeros((blend_res, blend_res, 1), np.float32)
                    upd = np.ones((blend_res, blend_res), bool)
                    if mask is not None and mask.any():
                        # Blend weight ramps in from stored regions
                        # (simplified whole-tile variant of the interactive
                        # path's dirty-area alpha).
                        a = mask.astype(np.float32)
                        alpha = a[..., None]
                        upd = ~mask
                    if cm > 0:
                        upd[:cm] = upd[-cm:] = False
                        upd[:, :cm] = upd[:, -cm:] = False
                    feats_list.append(feats[0] if feats is not None else
                                      np.zeros((blend_res, blend_res,
                                                fcanvas.features.shape[-1]),
                                               np.float32))
                    alpha_list.append(alpha)
                    upd_masks.append(upd)
                blended = {blend_res: (jnp.asarray(np.stack(feats_list)),
                                       jnp.asarray(np.stack(alpha_list)))}
                return_features = (blend_res,)

            out = engine._run_core(geom_b, brush_options,
                                   blended_features=blended,
                                   return_features=return_features)
            rgba = np.clip(np.asarray(out["rgba"]) * 255, 0, 255
                           ).astype(np.uint8)
            if blending:
                new_feats = np.asarray(out[f"features{blend_res}"])
            for i, (y, x, h, w) in enumerate(chunk):
                img = rgba[i]
                if crop_margin > 0:
                    img = img[crop_margin:-crop_margin,
                              crop_margin:-crop_margin]
                canvas[y + crop_margin:y + h - crop_margin,
                       x + crop_margin:x + w - crop_margin] = img
                if blending:
                    area = fcanvas.down_area(areas.make_area(y, x, h, w))
                    fcanvas.set_features(area, new_feats[i:i + 1],
                                         update_mask=upd_masks[i])

    if on_white:
        canvas = composite_on_white(canvas)
    return canvas
