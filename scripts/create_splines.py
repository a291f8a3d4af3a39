#!/usr/bin/env python
"""Generate random spline stroke patches for geometry training data.

Rebuild of the reference scripts/create_splines.py: centripetal Catmull-Rom
splines with sampled thickness, written as black-on-white PNGs, with
multiprocessing fan-out.
"""

import argparse
import logging
import os
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def render_one(task):
    idx, width, out_dir, seed, min_radius, max_radius = task
    from brushstroke_engine_tpu.data.curves import (
        random_spline_stroke, sample_radius,
    )
    import PIL.Image
    rng = np.random.default_rng(seed * 1000003 + idx)
    radius = sample_radius(rng, min_radius, max_radius)
    stroke = random_spline_stroke(rng, width, radius=radius)
    img = (stroke * 255).astype(np.uint8)
    path = os.path.join(out_dir, f"spline_{idx:06d}_rad{int(radius):03d}.png")
    PIL.Image.fromarray(img).save(path)
    return path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--num_images", type=int, default=1000)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--min_radius", type=float, default=1.0)
    ap.add_argument("--max_radius", type=float, default=26.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    os.makedirs(args.output_dir, exist_ok=True)
    tasks = [(i, args.width, args.output_dir, args.seed, args.min_radius,
              args.max_radius) for i in range(args.num_images)]
    if args.workers > 1:
        with Pool(args.workers) as pool:
            for i, _ in enumerate(pool.imap_unordered(render_one, tasks)):
                if i % 100 == 0:
                    print(f"{i}/{len(tasks)}")
    else:
        for i, t in enumerate(tasks):
            render_one(t)
    print(f"Wrote {args.num_images} spline patches to {args.output_dir}")


if __name__ == "__main__":
    main()
