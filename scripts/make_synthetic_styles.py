#!/usr/bin/env python
"""Deterministic synthetic style-image dataset for metric regression runs.

The on-TPU metric yardstick recorded in PARITY.md evaluates the snapshot
against a synthetic "real" style distribution (flat color + noise + a
linear luminance ramp).  This script regenerates that distribution
bit-for-bit (numpy default_rng, fixed seed) so the recorded FID/KID/PR
numbers stay comparable across rounds; pipe the output directory through
``scripts/dataset_tool.py`` to pack it.
"""

import argparse
import os

import numpy as np
import PIL.Image


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--num_images", type=int, default=1200)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    r = args.resolution
    rng = np.random.default_rng(args.seed)
    for i in range(args.num_images):
        base = rng.integers(30, 220, 3)
        img = np.clip(base[None, None] + rng.normal(0, 30, (r, r, 3)),
                      0, 255)
        gy = np.linspace(0, rng.integers(-40, 40), r)[:, None, None]
        gx = np.linspace(0, rng.integers(-40, 40), r)[None, :, None]
        img = np.clip(img + gy + gx, 0, 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(
            os.path.join(args.output_dir, f"{i:04d}.png"))
    print(f"Wrote {args.num_images} style images to {args.output_dir}")


if __name__ == "__main__":
    main()
