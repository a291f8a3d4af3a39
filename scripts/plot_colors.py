#!/usr/bin/env python
"""3D RGB scatter of an image's color distribution.

Rebuild of the reference utility (scripts/plot_colors.py): samples pixels,
sizes markers by multiplicity, and plots them at their own color in RGB
space.  Useful when choosing triad override colors for a style.  Headless
by default: writes a PNG next to the input (pass --show to open a window).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", required=True)
    ap.add_argument("--samples", type=int, default=5000)
    ap.add_argument("--out", default=None,
                    help="Output PNG (default: <image>.colors.png).")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()

    import matplotlib
    if not args.show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    img = np.asarray(Image.open(args.image).convert("RGB"))
    flat = img.reshape(-1, 3)
    rng = np.random.default_rng(args.seed)
    idx = rng.integers(0, flat.shape[0], args.samples)
    uniq, counts = np.unique(idx, return_counts=True)
    colors = flat[uniq].astype(np.float32) / 255.0

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(colors[:, 0], colors[:, 1], colors[:, 2], c=colors,
               edgecolors="none", depthshade=False, s=5.0 * counts)
    ax.set_xlim(0, 1); ax.set_ylim(0, 1); ax.set_zlim(0, 1)
    ax.set_xlabel("R"); ax.set_ylabel("G"); ax.set_zlabel("B")
    if args.show:
        plt.show()
    else:
        out = args.out or (os.path.splitext(args.image)[0] + ".colors.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print(f"Wrote {out}")


if __name__ == "__main__":
    main()
