#!/usr/bin/env python
"""Standalone FID between two image folders/zips (crops to 128px).

Rebuild of the reference scripts/fid_from_images.py -- used to evaluate
stylization outputs against real media.
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def batches_from_path(path, resolution, batch_size, max_items):
    from brushstroke_engine_tpu.train.dataset import ImageFolderDataset
    ds = ImageFolderDataset(path, resolution, resize_mode="crop")
    n = min(len(ds), max_items) if max_items else len(ds)
    for i in range(0, n, batch_size):
        yield np.stack([ds[j] for j in range(i, min(i + batch_size, n))])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images0", required=True)
    ap.add_argument("--images1", required=True)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--max_items", type=int, default=50000)
    ap.add_argument("--detector", default=None,
                    help="Path to real Inception-v3 detector weights; "
                         "defaults to NEUBE_FID_DETECTOR or the labeled "
                         "random fallback.")
    ap.add_argument("--pr", action="store_true",
                    help="Also report improved precision/recall "
                         "(Kynkaanniemi 2019, nhood_size=3).")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from brushstroke_engine_tpu.metrics import fid as fid_lib
    from brushstroke_engine_tpu.metrics.fid import fid_from_image_iterables

    if args.detector:
        fid_lib.set_default_extractor(fid_lib.load_detector(args.detector))

    def b0():
        return batches_from_path(args.images0, args.resolution,
                                 args.batch_size, args.max_items)

    def b1():
        return batches_from_path(args.images1, args.resolution,
                                 args.batch_size, args.max_items)

    fid = fid_from_image_iterables(b0(), b1(), max_items=args.max_items)
    print(f"FID: {fid:.4f} (detector={fid_lib.default_detector_kind()})")
    if args.pr:
        from brushstroke_engine_tpu.metrics.pr import compute_pr_from_images
        precision, recall = compute_pr_from_images(
            b0(), b1(), max_items=args.max_items)
        print(f"precision: {precision:.4f}")
        print(f"recall: {recall:.4f}")


if __name__ == "__main__":
    main()
