#!/usr/bin/env python
"""Build triband geometry images from gray stroke images.

Rebuild of the reference scripts/prep_geom_data.py:43-60: channels =
[gray input, binarized conditioning, blurred-binary loss target]; white = BG,
black = FG, gray = neither (confidence bands for partial losses).
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--blur_sigma", type=float, default=2.0)
    ap.add_argument("--threshold", type=float, default=None,
                    help="Binarization threshold; Otsu if omitted.")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import PIL.Image
    from brushstroke_engine_tpu.data.curves import triband_from_stroke
    from brushstroke_engine_tpu.utils.img_proc import (
        threshold_otsu, alpha_to_gray,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(args.input_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
            continue
        img = np.asarray(PIL.Image.open(
            os.path.join(args.input_dir, name)))
        gray = alpha_to_gray(img)
        t = args.threshold if args.threshold is not None \
            else threshold_otsu(gray)
        tri = triband_from_stroke(gray, blur_sigma=args.blur_sigma,
                                  threshold=t)
        out = (np.clip(tri, 0, 1) * 255).astype(np.uint8)
        PIL.Image.fromarray(out).save(
            os.path.join(args.output_dir,
                         os.path.splitext(name)[0] + "_tri.png"))
        count += 1
    print(f"Wrote {count} triband images to {args.output_dir}")


if __name__ == "__main__":
    main()
