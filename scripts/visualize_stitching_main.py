#!/usr/bin/env python
"""Stitching evaluation sheets: correct vs random patch positions.

Rebuild of the reference forger/viz/visualize_stitching_main.py.
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
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--num_styles", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from brushstroke_engine_tpu.engine.brush import PaintEngineFactory
    from brushstroke_engine_tpu.viz.visualize import TrainingVisualizer

    engine = PaintEngineFactory.create(
        args.gan_checkpoint, encoder_checkpoint=args.encoder_checkpoint)
    viz = TrainingVisualizer(width=engine.patch_width,
                             num_fixed_styles=args.num_styles,
                             seed=args.seed)
    viz.init(engine.gen_cfg.z_dim)
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(args.num_styles):
        viz.fixed_z = np.roll(viz.fixed_z, i, axis=0)
        viz.visualize_stitching(args.output_dir, engine, f"style{i}")
    print(f"Wrote stitching sheets to {args.output_dir}")


if __name__ == "__main__":
    main()
