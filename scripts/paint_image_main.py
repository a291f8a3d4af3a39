#!/usr/bin/env python
"""Stylize a line drawing with a brush style (batch painting CLI).

Rebuild of the reference CLI (forger/viz/paint_image_main.py:104-193) with
the same flags: reads any-format geometry image, tiles it into overlapping
patches, renders each through the paint engine with cross-patch feature
blending, assembles an RGBA canvas (optionally composited on white).
Supports style interpolation (--style_id2/--style_blend_alpha) and color
modes.
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def set_colors(color_mode: int, brush_options):
    """Preset color modes (reference paint_image_main.py:66-100)."""
    if color_mode == 0:
        return
    presets = {
        1: ([50, 60, 160], [210, 150, 130]),
        2: ([200, 50, 50], [250, 200, 100]),
        3: ([40, 40, 40], [150, 150, 150]),
    }
    if color_mode in presets:
        c0, c1 = presets[color_mode]
        brush_options.set_color(0, np.asarray(c0, np.uint8))
        brush_options.set_color(1, np.asarray(c1, np.uint8))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gan_checkpoint", required=True)
    ap.add_argument("--encoder_checkpoint", default=None)
    ap.add_argument("--geo_image", required=True,
                    help="Line drawing to stylize (any image format).")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--library", default=None,
                    help="Brush library file or spec (e.g. rand10).")
    ap.add_argument("--style_id", default=None)
    ap.add_argument("--style_seed", type=int, default=None)
    ap.add_argument("--style_id2", default=None)
    ap.add_argument("--style_blend_alpha", type=float, default=0.5)
    ap.add_argument("--color_mode", type=int, default=0)
    ap.add_argument("--feature_blending_level", type=int, default=2)
    ap.add_argument("--crop_margin", type=int, default=10)
    ap.add_argument("--overlap_margin", type=int, default=10)
    ap.add_argument("--render_mode", default="clear")
    ap.add_argument("--stitching_mode", choices=["all", "full", "nonempty"],
                    default="all",
                    help="Which patches to paint (reference "
                         "paint_image_main.py:110): 'all' renders every "
                         "tile; 'full' (alias 'nonempty') skips tiles "
                         "whose geometry patch has no stroke pixels.")
    ap.add_argument("--renderer",
                    choices=["ondevice", "batched", "sequential"],
                    default="ondevice",
                    help="ondevice = whole canvas as ONE jitted scan "
                         "(fastest); batched = host-side checkerboard "
                         "waves; sequential = reference-style per-tile "
                         "loop.")
    ap.add_argument("--on_white", action="store_true")
    ap.add_argument("--no_binarize", action="store_true")
    ap.add_argument("--precision", choices=["fast", "strict"],
                    default="fast",
                    help="'fast' (default) = native TPU conv passes; "
                         "'strict' = full-f32 for parity debugging.")
    ap.add_argument("--int8", choices=["off", "static"], default="off",
                    help="'static' = static-calibration int8 PTQ for the "
                         "synthesis stack (~1.29x measured; PSNR>25 dB).")
    ap.add_argument("--log_level", type=int, default=logging.INFO)
    args = ap.parse_args()
    logging.basicConfig(level=args.log_level)

    from brushstroke_engine_tpu.ops.precision import set_precision_mode
    set_precision_mode(args.precision)

    import PIL.Image
    from brushstroke_engine_tpu.engine.brush import (
        PaintEngineFactory, GanBrushOptions,
    )
    from brushstroke_engine_tpu.engine.canvas import PaintingHelper
    from brushstroke_engine_tpu.engine.library import BrushLibrary
    from brushstroke_engine_tpu.engine.stylize import (
        read_geometry_image, stylize_image, stylize_image_batched,
        stylize_image_ondevice,
    )

    engine = PaintEngineFactory.create(
        args.gan_checkpoint, encoder_checkpoint=args.encoder_checkpoint)
    engine.set_render_mode(args.render_mode)
    if args.int8 == "static" and hasattr(engine, "enable_int8_serving"):
        engine.enable_int8_serving()
    helper = PaintingHelper(engine, style_seed=args.style_seed)

    opts = GanBrushOptions()
    if args.library is not None:
        lib = BrushLibrary.from_arg(args.library,
                                    z_dim=engine.gen_cfg.z_dim)
        style_id = args.style_id or lib.get_style_ids()[0]
        if args.style_id2 is not None:
            lib.set_interpolated_style(style_id, args.style_id2,
                                       args.style_blend_alpha, opts)
        else:
            lib.set_style(style_id, opts)
    else:
        seed = args.style_seed if args.style_seed is not None else 0
        opts.set_style(engine.random_style(seed), seed)
    set_colors(args.color_mode, opts)

    img = np.asarray(PIL.Image.open(args.geo_image))
    geom = read_geometry_image(img, binarize=not args.no_binarize)

    crop_mode = "nonempty" if args.stitching_mode in ("full", "nonempty") \
        else "all"
    kw = dict(overlap_margin=args.overlap_margin,
              crop_margin=args.crop_margin,
              feature_blending_level=args.feature_blending_level,
              on_white=args.on_white, mode=crop_mode)
    has_jax_core = hasattr(engine, "_render_stroke_jax")
    if args.renderer == "sequential" or not has_jax_core:
        canvas = stylize_image(helper, geom, opts, **kw)
    elif args.renderer == "batched":
        canvas = stylize_image_batched(engine, geom, opts, **kw)
    else:
        canvas = stylize_image_ondevice(engine, geom, opts, **kw)

    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.geo_image))[0]
    out_path = os.path.join(
        args.output_dir,
        f"{base}_style{opts.style_id}_c{args.color_mode}.png")
    PIL.Image.fromarray(canvas).save(out_path)
    print(f"Wrote {out_path}")


if __name__ == "__main__":
    main()
