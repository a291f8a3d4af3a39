#!/usr/bin/env python
"""Bulk style rendering: patch files for CLIP dictionaries (mode 0) or
style x geometry x color grids (mode 1).

Rebuild of the reference forger/viz/visualize_main.py:49-163.
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gan_checkpoint", required=True)
    ap.add_argument("--encoder_checkpoint", default=None)
    ap.add_argument("--library", default="rand20")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--mode", type=int, default=0,
                    help="0 = per-style patch files, 1 = diagnostic grids.")
    ap.add_argument("--geometry", default="curve",
                    help="Curated shape name for mode 0 thumbnails.")
    ap.add_argument("--radius", type=int, default=16)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import PIL.Image
    from brushstroke_engine_tpu.engine.brush import (
        PaintEngineFactory, GanBrushOptions,
    )
    from brushstroke_engine_tpu.engine.library import BrushLibrary
    from brushstroke_engine_tpu.data.curated_geometry import (
        curated_geometry_patch,
    )
    from brushstroke_engine_tpu.viz.visualize import (
        TrainingVisualizer, visualize_raw_data, save_image,
    )

    engine = PaintEngineFactory.create(
        args.gan_checkpoint, encoder_checkpoint=args.encoder_checkpoint)
    lib = BrushLibrary.from_arg(args.library, z_dim=engine.gen_cfg.z_dim)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.mode == 0:
        for style_id in lib.get_style_ids():
            opts = GanBrushOptions()
            lib.set_style(style_id, opts)
            icon = engine.uvs_mapper.get_brush_icon(opts)
            PIL.Image.fromarray(icon).save(
                os.path.join(args.output_dir, f"{style_id}.png"))
        print(f"Wrote {len(lib.get_style_ids())} style patches")
    else:
        geom = curated_geometry_patch(args.geometry, args.radius,
                                      engine.patch_width)[None, ..., None]
        for style_id in lib.get_style_ids():
            opts = GanBrushOptions()
            lib.set_style(style_id, opts)
            out = engine._run_core(np.asarray(geom, np.float32), opts)
            sheet = visualize_raw_data(out, geom)
            save_image(os.path.join(args.output_dir,
                                    f"grid_{style_id}.png"), sheet)
        print("Wrote diagnostic grids")


if __name__ == "__main__":
    main()
