#!/usr/bin/env python
"""Render a W-space neighborhood grid around a style seed.

Rebuild of the reference forger/experiment/latent_exploration/seed_expand.py.
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
    ap.add_argument("--seed", type=int, required=True,
                    help="Center style seed.")
    ap.add_argument("--grid", type=int, default=5)
    ap.add_argument("--radius_scale", type=float, default=0.2)
    ap.add_argument("--output_dir", required=True)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from brushstroke_engine_tpu.engine.brush import (
        PaintEngineFactory, GanBrushOptions,
    )
    from brushstroke_engine_tpu.tools.latent import seed_grid
    from brushstroke_engine_tpu.data.curated_geometry import (
        curated_geometry_patch,
    )
    from brushstroke_engine_tpu.viz.visualize import (
        to_uint8, save_image, make_grid,
    )

    engine = PaintEngineFactory.create(
        args.gan_checkpoint, encoder_checkpoint=args.encoder_checkpoint)
    grid_ws = seed_grid(engine, args.seed, args.radius_scale, args.grid)
    geom = curated_geometry_patch("curve", 16, engine.patch_width)
    geom = geom[None, ..., None].astype(np.float32)

    renders = []
    for ws in grid_ws:
        opts = GanBrushOptions()
        opts.set_style_w(ws[None], "grid")
        out = engine._run_core(geom, opts)
        renders.append(np.asarray(out["rgba"])[0, ..., :3])
    sheet = make_grid(np.stack(renders), nrow=args.grid, pad=2)
    os.makedirs(args.output_dir, exist_ok=True)
    save_image(os.path.join(args.output_dir,
                            f"seed{args.seed}_grid.png"), to_uint8(sheet))
    print(f"Wrote seed grid for {args.seed}")


if __name__ == "__main__":
    main()
