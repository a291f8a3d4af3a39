#!/usr/bin/env python
"""Finetune every style in a brush library for background clarity.

Rebuild of the reference scripts/opt_clarity_main.py: optimizes each style's
W+ with the default clarity objective and writes OPT_<library>.pkl.
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
    ap.add_argument("--library", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--num_steps", type=int, default=300)
    ap.add_argument("--losses",
                    default="0.5*iou_inv(uvs)+0.5*iou(u)"
                            "+50*lpips(fake_orig)+50*l1(fake_orig)")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from brushstroke_engine_tpu.engine.brush import PaintEngineFactory
    from brushstroke_engine_tpu.engine.library import BrushLibrary
    from brushstroke_engine_tpu.tools.clarity import (
        optimize_library_clarity, ClarityConfig,
    )
    from brushstroke_engine_tpu.data.curves import random_spline_stroke

    engine = PaintEngineFactory.create(
        args.gan_checkpoint, encoder_checkpoint=args.encoder_checkpoint)
    library = BrushLibrary.from_file(args.library,
                                     z_dim=engine.gen_cfg.z_dim)

    def geometry_batches():
        rng = np.random.default_rng(args.seed)
        w = engine.patch_width
        while True:
            yield np.stack([
                random_spline_stroke(rng, w)[..., None]
                for _ in range(args.batch_size)])

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(
        args.output_dir,
        "OPT_" + os.path.basename(args.library))
    optimize_library_clarity(
        engine, library, geometry_batches(), out_path=out_path,
        cfg=ClarityConfig(num_steps=args.num_steps, losses=args.losses))
    print(f"Wrote {out_path}")


if __name__ == "__main__":
    main()
