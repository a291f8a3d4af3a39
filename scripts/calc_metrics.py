#!/usr/bin/env python
"""Metric-zoo evaluation of a snapshot: fid / kid / is / pr / ppl.

Rebuild of the reference's standalone calc_metrics entry (the
stylegan2-ada metric zoo driven over the paint-engine protocol: real
statistics from the style dataset, generated statistics by painting random
styles over geometry in 'full' render mode).  NeuBE's training-time
metrics are fid+forger (scripts/metric_main.py covers the forger loop);
this CLI exposes the rest of the zoo.
"""

import argparse
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

logger = logging.getLogger(__name__)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gan_checkpoint", required=True)
    ap.add_argument("--encoder_checkpoint", default=None)
    ap.add_argument("--data", default=None,
                    help="Style image dataset (dir or zip) for real stats; "
                         "required for fid/kid/pr.")
    ap.add_argument("--geom_data", default=None,
                    help="Triband geometry dataset; synthetic if omitted.")
    ap.add_argument("--metrics", default="fid,kid,is,pr,ppl",
                    help="CSV subset of: fid, fid_fadecanvas, kid, is, pr, "
                         "ppl_w, ppl_z.")
    ap.add_argument("--num_items", type=int, default=2000,
                    help="Real/generated sample budget per metric.")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="Optional JSON output path.")
    ap.add_argument("--manifest", default=None,
                    help="Path to a pinned regression manifest "
                         "(metrics_manifest.json): forces/verifies the "
                         "protocol parameters (metrics, num_items, batch, "
                         "seed, detector kind) so the resulting numbers "
                         "are comparable to the recorded yardstick by "
                         "construction; prints deltas vs the recorded "
                         "values at the end.")
    ap.add_argument("--detector", default=None,
                    help="Path to real Inception-v3 detector weights "
                         "(torchvision or reference-TorchScript state_dict); "
                         "defaults to NEUBE_FID_DETECTOR or the labeled "
                         "random fallback.")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    manifest = None
    if args.manifest:
        with open(args.manifest) as f:
            manifest = json.load(f)
        proto = manifest["protocol"]
        # Protocol parameters come FROM the manifest; explicitly passed
        # conflicting values are an error, not a silent divergence.
        for flag, key in (("metrics", "metrics"),
                          ("num_items", "num_items"),
                          ("batch_size", "batch_size"), ("seed", "seed")):
            want = proto[key]
            got = getattr(args, flag)
            default = ap.get_default(flag)
            if got != default and got != want:
                ap.error(f"--{flag}={got!r} conflicts with the manifest's "
                         f"pinned {key}={want!r}")
            setattr(args, flag, want)

    metrics = [m.strip() for m in args.metrics.split(",") if m.strip()]

    import jax.numpy as jnp
    from brushstroke_engine_tpu.metrics.stroke_generator import (
        PaintStrokeGenerator, RandomState,
    )
    from brushstroke_engine_tpu.metrics import fid as fid_lib
    from brushstroke_engine_tpu.metrics.metric_main import forger_compute_fid
    from brushstroke_engine_tpu.train.dataset import (
        ImageFolderDataset, SyntheticGeometryDataset, BatchIterator,
    )

    if args.detector:
        fid_lib.set_default_extractor(fid_lib.load_detector(args.detector))

    gen = PaintStrokeGenerator.create(
        args.encoder_checkpoint, args.gan_checkpoint, args.batch_size,
        random_state=RandomState(args.seed))
    res = gen.engine.patch_width
    if args.geom_data:
        geom_ds = ImageFolderDataset(args.geom_data, res + 64, channels=3)
    else:
        geom_ds = SyntheticGeometryDataset(res + 64)
    geom_iter = BatchIterator(geom_ds, args.batch_size, seed=args.seed)
    gen.set_geometry_source_from_iterator(geom_iter, args.batch_size)

    def real_batches():
        assert args.data, "--data is required for real-statistics metrics"
        ds = ImageFolderDataset(args.data, res, resize_mode="crop")
        n = min(len(ds), args.num_items)
        for i in range(0, n, args.batch_size):
            yield np.stack([ds[j]
                            for j in range(i, min(i + args.batch_size, n))])

    def gen_images(n):
        gen.set_render_mode("full")
        out = []
        total = 0
        while total < n:
            gen.set_new_geom()
            gen.set_new_styles(gen.get_random_styles())
            gen.set_random_colors()
            rgb = gen.generate()[..., :3]
            out.append(np.clip(rgb * 255, 0, 255).astype(np.uint8))
            total += len(out[-1])
        return np.concatenate(out)[:n]

    def features(images):
        fs = []
        for i in range(0, len(images), args.batch_size):
            fs.append(np.asarray(fid_lib.extract_features(
                jnp.asarray(images[i:i + args.batch_size]))))
        return np.concatenate(fs)

    results = {}
    real_feats = gen_feats = None
    need_feats = {"kid", "is", "pr"} & set(metrics)
    if need_feats:
        gen_feats = features(gen_images(args.num_items))
        if {"kid", "pr"} & set(metrics):
            real_feats = np.concatenate(
                [np.asarray(fid_lib.extract_features(jnp.asarray(b)))
                 for b in real_batches()])

    for m in metrics:
        if m == "fid":
            results[m] = forger_compute_fid(gen, real_batches(),
                                            num_items=args.num_items)
        elif m == "fid_fadecanvas":
            results[m] = forger_compute_fid(gen, real_batches(),
                                            num_items=args.num_items,
                                            fade_canvas=True)
        elif m == "kid":
            results[m] = fid_lib.kernel_inception_distance(
                real_feats, gen_feats, seed=args.seed)
        elif m == "is":
            results[m] = fid_lib.inception_score(gen_feats)
        elif m == "pr":
            from brushstroke_engine_tpu.metrics.pr import compute_pr
            p, r = compute_pr(real_feats, gen_feats)
            results["precision"] = p
            results["recall"] = r
        elif m in ("ppl", "ppl_w", "ppl_z"):
            from brushstroke_engine_tpu.metrics.ppl import compute_ppl
            from brushstroke_engine_tpu.models.geo_encoder import (
                geo_encoder_encode,
            )
            eng = gen.engine
            geom = next(iter(geom_iter))
            g = (np.asarray(geom, np.float32) / 255.0)[:1, :res, :res, 1:2]
            feats = geo_encoder_encode(eng.enc_cfg, eng.enc_params,
                                       eng.enc_state, jnp.asarray(g),
                                       res=list(eng.enc_res))
            results[m] = compute_ppl(
                eng, feats,
                num_samples=min(args.num_items, 256),
                space="z" if m == "ppl_z" else "w",
                batch=args.batch_size, seed=args.seed)
        else:
            raise ValueError(f"unknown metric {m!r}")
        logger.info("%s computed", m)

    out = {k: round(float(v), 6) for k, v in results.items()}
    # Label which feature detector produced the numbers: random-feature
    # values are valid for regression tracking but NOT comparable to
    # published (pretrained-Inception) metric values.
    out["detector"] = fid_lib.default_detector_kind()
    if manifest is not None:
        want_det = manifest["protocol"].get("detector")
        if want_det and out["detector"] != want_det:
            raise SystemExit(
                f"detector kind {out['detector']!r} does not match the "
                f"manifest's pinned {want_det!r}; the numbers would not be "
                "comparable to the recorded yardstick")
        recorded = manifest.get("recorded", {})
        out["vs_recorded"] = {
            k: round(float(out[k]) - float(v), 6)
            for k, v in recorded.items()
            if k in out and isinstance(v, (int, float))}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
