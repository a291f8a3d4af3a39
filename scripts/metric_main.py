#!/usr/bin/env python
"""Standalone stroke-metric evaluation over a brush library.

Rebuild of the reference CLI (forger/metrics/metric_main.py:267-326): loads a
paint engine, iterates styles from a library (or rand<N>), and writes
per-style + summary metric files.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gan_checkpoint", required=True)
    ap.add_argument("--encoder_checkpoint", default=None)
    ap.add_argument("--geom_data", default=None,
                    help="Triband geometry dataset; synthetic if omitted.")
    ap.add_argument("--library", default="rand200",
                    help="Brush library path / seeds CSV / rand<N>.")
    ap.add_argument("--eval_output_dir", required=True)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--nbatches_per_style", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--enable_stitching", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from brushstroke_engine_tpu.metrics.stroke_generator import (
        PaintStrokeGenerator, RandomState,
    )
    from brushstroke_engine_tpu.metrics.metric_main import (
        paint_engine_metric_loop, summary_losses_to_file,
    )
    from brushstroke_engine_tpu.engine.library import BrushLibrary
    from brushstroke_engine_tpu.train.dataset import (
        ImageFolderDataset, SyntheticGeometryDataset, BatchIterator,
    )
    from brushstroke_engine_tpu.train.stitching import RandomStitcher

    gen = PaintStrokeGenerator.create(
        args.encoder_checkpoint, args.gan_checkpoint, args.batch_size,
        random_state=RandomState(args.seed))
    res = gen.engine.patch_width
    if args.geom_data:
        geom_ds = ImageFolderDataset(args.geom_data, res + 64, channels=3)
    else:
        geom_ds = SyntheticGeometryDataset(res + 64)
    geom_iter = BatchIterator(geom_ds, args.batch_size, seed=args.seed)
    gen.set_geometry_source_from_iterator(geom_iter, args.batch_size)

    lib = BrushLibrary.from_arg(args.library,
                                z_dim=gen.engine.gen_cfg.z_dim)
    stitcher = RandomStitcher() if args.enable_stitching else None
    summary = paint_engine_metric_loop(
        gen, lib, args.nbatches_per_style,
        fullres_geom_iterator=geom_iter if args.enable_stitching else None,
        stitcher=stitcher,
        eval_output_dir=args.eval_output_dir)
    summary_losses_to_file(
        os.path.join(args.eval_output_dir, "all_summary.txt"), summary,
        do_print=True)


if __name__ == "__main__":
    main()
