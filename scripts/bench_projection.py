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

    # Time FULL runs (what a CLI user pays), second invocation each so the
    # persistent compile cache is warm.  Per-step micro-timing is hopeless
    # here: each project() call re-traces its jit (fresh closures), and the
    # cache-load + setup noise over the dev tunnel swamps a 40-step delta.
    cfg = P.ProjectionConfig(num_steps=args.steps, w_avg_samples=256,
                             min_lpips_improvement=-1.0,
                             optimize_noise=True)

    def run_parallel():
        P.project_parallel(eng, targets, geoms, cfg, seed=0,
                           log_every=10**6)

    def run_single():
        P.project(eng, targets[0], geoms[0], cfg, seed=0, log_every=10**6)

    def timed(fn):
        fn()                                     # warm the compile cache
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(run_single)
    tn = timed(run_parallel)
    print(json.dumps({
        "metric": f"full projection run, {args.steps} steps "
                  f"({args.resolution}px, {bp} patches/style)",
        "single_style_s": round(t1, 2),
        "parallel_styles": n,
        "parallel_run_s": round(tn, 2),
        "speedup_vs_sequential": round(n * t1 / tn, 2),
    }))


if __name__ == "__main__":
    main()
