#!/usr/bin/env python
"""Extract augmented multi-scale patches from style media images.

Rebuild of the reference scripts/patch_augment.py: random square patches at
multiple scales with flips/rotations, filtered by intensity entropy, written
into a zip for GAN style training.
"""

import argparse
import logging
import os
import sys
import zipfile
import io

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--output_zip", required=True)
    ap.add_argument("--patch_width", type=int, default=128)
    ap.add_argument("--patches_per_image", type=int, default=50)
    ap.add_argument("--scale_min", type=float, default=1.0)
    ap.add_argument("--scale_max", type=float, default=2.0)
    ap.add_argument("--min_entropy", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import PIL.Image
    from brushstroke_engine_tpu.utils.img_proc import (
        RandomPatchGenerator, patch_entropy, resize_bilinear,
    )

    rng = np.random.default_rng(args.seed)
    gen = RandomPatchGenerator(rng, args.patch_width,
                               (args.scale_min, args.scale_max))
    written = skipped = 0
    with zipfile.ZipFile(args.output_zip, "w") as zf:
        for name in sorted(os.listdir(args.input_dir)):
            if not name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
                continue
            img = np.asarray(PIL.Image.open(
                os.path.join(args.input_dir, name)).convert("RGB"))
            if min(img.shape[:2]) < args.patch_width:
                continue
            for i in range(args.patches_per_image):
                patch = gen.sample(img)
                if patch.shape[0] != args.patch_width:
                    patch = np.clip(resize_bilinear(
                        patch.astype(np.float32), args.patch_width,
                        args.patch_width), 0, 255).astype(np.uint8)
                if rng.random() < 0.5:
                    patch = patch[:, ::-1]
                patch = np.rot90(patch, k=int(rng.integers(0, 4)))
                gray = patch.astype(np.float32).mean(-1) / 255.0
                if patch_entropy(gray) < args.min_entropy:
                    skipped += 1
                    continue
                base = os.path.splitext(name)[0]
                buf = io.BytesIO()
                PIL.Image.fromarray(np.ascontiguousarray(patch)).save(
                    buf, format="PNG")
                zf.writestr(f"{base}_{i:04d}.png", buf.getvalue())
                written += 1
    print(f"Wrote {written} patches ({skipped} low-entropy skipped) to "
          f"{args.output_zip}")


if __name__ == "__main__":
    main()
