#!/usr/bin/env python
"""Dump W vectors for style seed lists (binary float64, for PCA/analysis).

Rebuild of the reference forger/metrics/get_ws_main.py.
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
    ap.add_argument("--seeds", default="0-999",
                    help="Seed range 'a-b' or CSV list.")
    ap.add_argument("--output_file", required=True)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from brushstroke_engine_tpu.engine.brush import PaintEngineFactory
    from brushstroke_engine_tpu.tools.latent import dump_ws

    if "-" in args.seeds:
        a, b = args.seeds.split("-")
        seeds = list(range(int(a), int(b) + 1))
    else:
        seeds = [int(x) for x in args.seeds.split(",")]

    engine = PaintEngineFactory.create(
        args.gan_checkpoint, encoder_checkpoint=args.encoder_checkpoint)
    ws = dump_ws(engine, seeds, args.output_file)
    print(f"Wrote {ws.shape[0]} W vectors (dim {ws.shape[1]}) to "
          f"{args.output_file}")


if __name__ == "__main__":
    main()
