#!/usr/bin/env python
"""Reshuffle triband image channels.

Rebuild of the reference scripts/reformat_triband_data_main.py (channel
reordering of triband geometry datasets).
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
    ap.add_argument("--channel_order", default="0,1,2",
                    help="New channel order as CSV of source indices.")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import PIL.Image
    order = [int(x) for x in args.channel_order.split(",")]
    assert len(order) == 3 and all(0 <= i < 3 for i in order)
    os.makedirs(args.output_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(args.input_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = np.asarray(PIL.Image.open(
            os.path.join(args.input_dir, name)).convert("RGB"))
        out = img[..., order]
        PIL.Image.fromarray(np.ascontiguousarray(out)).save(
            os.path.join(args.output_dir, name))
        count += 1
    print(f"Reformatted {count} triband images")


if __name__ == "__main__":
    main()
