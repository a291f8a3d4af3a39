#!/usr/bin/env python
"""Package an image folder into a training zip (resized/cropped).

Rebuild of the reference thirdparty/.../dataset_tool.py for this framework's
zip dataset format.
"""

import argparse
import io
import logging
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="Image directory.")
    ap.add_argument("--dest", required=True, help="Output zip.")
    ap.add_argument("--resolution", type=int, default=None,
                    help="Center-crop/resize to this square size.")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import PIL.Image
    from brushstroke_engine_tpu.utils.img_proc import resize_bilinear

    count = 0
    with zipfile.ZipFile(args.dest, "w") as zf:
        for root, _dirs, files in os.walk(args.source):
            for name in sorted(files):
                if not name.lower().endswith(
                        (".png", ".jpg", ".jpeg", ".bmp", ".webp")):
                    continue
                img = np.asarray(PIL.Image.open(
                    os.path.join(root, name)).convert("RGB"))
                if args.resolution:
                    r = args.resolution
                    h, w = img.shape[:2]
                    s = r / min(h, w)
                    img = np.clip(resize_bilinear(
                        img.astype(np.float32), max(r, round(h * s)),
                        max(r, round(w * s))), 0, 255).astype(np.uint8)
                    h, w = img.shape[:2]
                    y, x = (h - r) // 2, (w - r) // 2
                    img = img[y:y + r, x:x + r]
                buf = io.BytesIO()
                PIL.Image.fromarray(np.ascontiguousarray(img)).save(
                    buf, format="PNG")
                zf.writestr(f"{count:08d}.png", buf.getvalue())
                count += 1
    print(f"Packed {count} images into {args.dest}")


if __name__ == "__main__":
    main()
