#!/usr/bin/env python
"""Render sweeps along W-space PCA directions.

Rebuild of the reference forger/viz/visualize_pca_main.py: computes principal
directions from dumped/sampled W vectors and renders style sweeps along each.
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
    ap.add_argument("--ws_file", default=None,
                    help="Binary f64 W dump (get_ws_main); sampled if absent.")
    ap.add_argument("--num_seeds", type=int, default=200)
    ap.add_argument("--num_components", type=int, default=4)
    ap.add_argument("--num_steps", type=int, default=7)
    ap.add_argument("--sweep_scale", type=float, default=2.0)
    ap.add_argument("--output_dir", required=True)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from brushstroke_engine_tpu.engine.brush import (
        PaintEngineFactory, GanBrushOptions,
    )
    from brushstroke_engine_tpu.tools.latent import (
        ws_for_seeds, pca_directions,
    )
    from brushstroke_engine_tpu.data.curated_geometry import (
        curated_geometry_patch,
    )
    from brushstroke_engine_tpu.viz.visualize import to_uint8, save_image

    engine = PaintEngineFactory.create(
        args.gan_checkpoint, encoder_checkpoint=args.encoder_checkpoint)
    if args.ws_file:
        w = np.fromfile(args.ws_file, np.float64).reshape(
            -1, engine.gen_cfg.w_dim).astype(np.float32)
    else:
        w = ws_for_seeds(engine, list(range(args.num_seeds)))[:, 0, :]
    comps, var = pca_directions(w, args.num_components)
    mean = w.mean(0)

    geom = curated_geometry_patch("curve", 16, engine.patch_width)
    geom = geom[None, ..., None].astype(np.float32)
    os.makedirs(args.output_dir, exist_ok=True)
    num_ws = engine.gen_cfg.num_ws

    for ci in range(args.num_components):
        row = []
        for t in np.linspace(-args.sweep_scale, args.sweep_scale,
                             args.num_steps):
            wi = mean + t * np.sqrt(var[ci]) * comps[ci]
            ws = np.tile(wi[None, None, :], (1, num_ws, 1))
            opts = GanBrushOptions()
            opts.set_style_w(ws.astype(np.float32), f"pca{ci}_{t:.1f}")
            out = engine._run_core(geom, opts)
            row.append(np.asarray(out["rgba"])[0, ..., :3])
        save_image(os.path.join(args.output_dir, f"pca_{ci}.png"),
                   to_uint8(np.concatenate(row, axis=1)))
    print(f"Wrote {args.num_components} PCA sweeps to {args.output_dir}")


if __name__ == "__main__":
    main()
