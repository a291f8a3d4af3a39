#!/usr/bin/env python
"""Parallel-projection throughput: N styles in one vmapped program vs N
sequential single-style programs (steady-state per-step time, compiles
excluded).  Evidence for tools/projection.py:project_parallel."""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--patches", type=int, default=4)
    ap.add_argument("--styles", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()

    import jax
    from brushstroke_engine_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    from brushstroke_engine_tpu.flagship import flagship_bundle
    from brushstroke_engine_tpu.engine.brush import TriadGanPaintEngine
    from brushstroke_engine_tpu.ops.precision import set_precision_mode
    from brushstroke_engine_tpu.tools import projection as P

    set_precision_mode("fast")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        b = flagship_bundle(img_resolution=args.resolution, num_bf16_res=4)
    eng = TriadGanPaintEngine(
        b.gen_cfg, b.gen_params, b.gen_state, b.enc_cfg, b.enc_params,
        b.enc_state, geom_inject_resolutions=b.geom_inject_resolutions)

    rng = np.random.RandomState(0)
    n, bp, r = args.styles, args.patches, args.resolution
    targets = np.tanh(rng.randn(n, bp, r, r, 3)).astype(np.float32)
    geoms = (rng.rand(n, bp, r, r, 1) > 0.5).astype(np.float32)

    def steady_step_time(fn):
        """Per-step time via the difference of a short and a long cached
        run, cancelling compile/setup (w-stats, encode) fixed costs.
        Both chunk lengths are compiled BEFORE timing."""
        fn(2)
        fn(2 + args.steps)
        t0 = time.perf_counter()
        fn(2)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(2 + args.steps)
        t_long = time.perf_counter() - t0
        return max(t_long - t_short, 1e-9) / args.steps

    cfg0 = P.ProjectionConfig(w_avg_samples=256, min_lpips_improvement=-1.0,
                              optimize_noise=True)
    import dataclasses

    def run_parallel(num_steps):
        cfg = dataclasses.replace(cfg0, num_steps=num_steps)
        P.project_parallel(eng, targets, geoms, cfg, seed=0, log_every=10**6)

    def run_single(num_steps):
        cfg = dataclasses.replace(cfg0, num_steps=num_steps)
        P.project(eng, targets[0], geoms[0], cfg, seed=0, log_every=10**6)

    t1 = steady_step_time(run_single)
    tn = steady_step_time(run_parallel)
    print(json.dumps({
        "metric": f"projection step time ({args.resolution}px, "
                  f"{bp} patches/style)",
        "single_style_ms": round(t1 * 1e3, 1),
        "parallel_styles": n,
        "parallel_ms_per_step": round(tn * 1e3, 1),
        "speedup_vs_sequential": round(n * t1 / tn, 2),
    }))


if __name__ == "__main__":
    main()
