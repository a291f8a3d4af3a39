#!/usr/bin/env python
"""Project real (style image, geometry) pairs into W+ / noise brush styles.

Rebuild of the reference projection CLI (scripts/project_main.py:504-616):
samples patches from a large artwork, runs the Adam projection with
LPIPS(+L1-FG+BG) targets, saves per-style npz results and appends to the
aggregate ALL_projected pkl brush library (skipping already-done styles).
"""

import argparse
import logging
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

logger = logging.getLogger(__name__)


def load_target_patches(image_path, patch_width, num_patches, seed,
                        fg_centered=True):
    """Sample square patches from a large artwork (reference load_target /
    load_target_sparse, project_main.py:253-344)."""
    import PIL.Image
    from brushstroke_engine_tpu.utils.img_proc import (
        RandomPatchGenerator, alpha_to_gray, threshold_otsu,
    )
    img = np.asarray(PIL.Image.open(image_path).convert("RGB"),
                     np.float32) / 255.0
    gray = img.mean(-1)
    t = threshold_otsu(gray)
    fg_mask = gray <= t
    rng = np.random.default_rng(seed)
    gen = RandomPatchGenerator(rng, patch_width)
    targets, geoms = [], []
    for _ in range(num_patches):
        h, w = img.shape[:2]
        for _try in range(30):
            y = rng.integers(0, max(h - patch_width, 0) + 1)
            x = rng.integers(0, max(w - patch_width, 0) + 1)
            patch = img[y:y + patch_width, x:x + patch_width]
            mpatch = fg_mask[y:y + patch_width, x:x + patch_width]
            if not fg_centered or mpatch.mean() > 0.05:
                break
        targets.append(patch * 2 - 1)
        geoms.append(1.0 - mpatch.astype(np.float32))
    return np.stack(targets), np.stack(geoms)[..., None]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gan_checkpoint", required=True)
    ap.add_argument("--encoder_checkpoint", default=None)
    ap.add_argument("--target_image", required=True, nargs="+",
                    help="Artwork image to project.")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--style_name", default=None)
    ap.add_argument("--num_steps", type=int, default=1000)
    ap.add_argument("--num_patches", type=int, default=4)
    ap.add_argument("--w_plus", type=int, default=1)
    ap.add_argument("--optimize_noise", type=int, default=1)
    ap.add_argument("--l1_fg_weight", type=float, default=0.0)
    ap.add_argument("--bg_weight", type=float, default=0.0)
    ap.add_argument("--with_composite", action="store_true")
    ap.add_argument("--regularize_noise_weight", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--library_name", default="ALL_projected_styles.pkl")
    ap.add_argument("--skip_existing", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from brushstroke_engine_tpu.engine.brush import PaintEngineFactory
    from brushstroke_engine_tpu.tools.projection import (
        project, project_parallel, ProjectionConfig,
    )

    engine = PaintEngineFactory.create(
        args.gan_checkpoint, encoder_checkpoint=args.encoder_checkpoint)
    os.makedirs(args.output_dir, exist_ok=True)
    lib_path = os.path.join(args.output_dir, args.library_name)

    library = {}
    if os.path.isfile(lib_path):
        with open(lib_path, "rb") as f:
            library = pickle.load(f)

    names = [args.style_name] if (args.style_name
                                  and len(args.target_image) == 1) else \
        [os.path.splitext(os.path.basename(p))[0]
         for p in args.target_image]
    jobs = [(nm, p) for nm, p in zip(names, args.target_image)
            if not (args.skip_existing and nm in library)]
    for nm in set(names) - {nm for nm, _ in jobs}:
        logger.info("Style %s already projected; skipping", nm)
    if not jobs:
        return

    cfg = ProjectionConfig(
        num_steps=args.num_steps, w_plus=bool(args.w_plus),
        optimize_noise=bool(args.optimize_noise),
        l1_fg_weight=args.l1_fg_weight, bg_weight=args.bg_weight,
        with_composite=args.with_composite,
        regularize_noise_weight=args.regularize_noise_weight)

    pairs = [load_target_patches(p, engine.patch_width, args.num_patches,
                                 args.seed) for _, p in jobs]
    if len(jobs) == 1:
        results = [project(engine, pairs[0][0], pairs[0][1], cfg,
                           seed=args.seed)]
    else:
        # All styles optimize simultaneously in one vmapped chip program
        # (the reference loops one ~1000-step run per artwork).
        results = project_parallel(
            engine, np.stack([t for t, _ in pairs]),
            np.stack([g for _, g in pairs]), cfg, seed=args.seed)

    for (style_name, _), result in zip(jobs, results):
        npz_path = os.path.join(args.output_dir, f"{style_name}.npz")
        np.savez(npz_path, w=result["w"], bg=result["bg"],
                 step=result["step"],
                 **{f"noise/{k}": v for k, v in result["noise"].items()})
        library[style_name] = {"w": result["w"], "noise": result["noise"]}
        print(f"Projected {style_name}: lpips {result['lpips']:.4f} "
              f"-> {npz_path}; library {lib_path}")
    with open(lib_path, "wb") as f:
        pickle.dump(library, f)


if __name__ == "__main__":
    main()
