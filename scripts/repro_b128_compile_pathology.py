#!/usr/bin/env python
"""Minimal repro: the B=128 @ 128px generator-forward compile pathology.

The flagship generator FORWARD (training config: random per-layer noise,
geometry injection at res 0,1) compiles to an ~11x slower XLA:TPU program
at EXACTLY batch 128 and 128px than at neighboring batch sizes
(docs/ARCHITECTURE.md; observed 96 ms vs 15 ms at B=64 / 26 ms at B=160
on v5e).  256px/B=128 and B=96/112/160 at 128px are all fine, so this is
a compiler tiling choice, not a model property.  `TrainConfig` warns on
the shape; this script reproduces the measurement so the pathology can be
re-checked against new compiler releases (and reported upstream with the
dumped HLO).

Usage:
  python scripts/repro_b128_compile_pathology.py [--batches 64,96,128,160]
  # Optionally dump HLO for an upstream report:
  XLA_FLAGS=--xla_dump_to=/tmp/b128_hlo python scripts/... --batches 128
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", default="64,96,128,160")
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from brushstroke_engine_tpu.flagship import flagship_bundle
    from brushstroke_engine_tpu.models.generator import generator_apply
    from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode

    b = flagship_bundle(img_resolution=args.resolution, num_bf16_res=4)

    @partial(jax.jit, static_argnames=("n",))
    def fwd(z, feats, rng, n):
        img, _, _ = generator_apply(
            b.gen_cfg, b.gen_params, b.gen_state, z=z,
            geom_features=feats, noise_mode="random", rng=rng)
        return img

    results = {}
    for bs in [int(x) for x in args.batches.split(",")]:
        rng = np.random.RandomState(bs)
        z = jnp.asarray(rng.randn(bs, b.gen_cfg.z_dim), jnp.float32)
        geom = jnp.asarray(
            (rng.rand(bs, args.resolution, args.resolution, 1) > 0.5),
            jnp.float32)
        feats = geo_encoder_encode(b.enc_cfg, b.enc_params, b.enc_state,
                                   geom, res=list(b.geom_inject_resolutions))
        key = jax.random.PRNGKey(bs)
        t0 = time.perf_counter()
        fwd(z, feats, key, bs).block_until_ready()
        compile_s = time.perf_counter() - t0
        # Warm thoroughly: the FIRST timed pass after a fresh-process
        # compile can run ~10x slow (one-time device work) — round 3's
        # "B=128 pathology" measurement is suspected to be exactly this
        # artifact.  Best-of-3 timed passes, chained on-device.
        for i in range(3):
            fwd(z, feats, jax.random.fold_in(key, 100 + i),
                bs).block_until_ready()
        ms = 1e30
        for _rep in range(3):
            t0 = time.perf_counter()
            out = None
            for i in range(args.iters):
                out = fwd(z, feats, jax.random.fold_in(key, i), bs)
            out.block_until_ready()
            ms = min(ms, (time.perf_counter() - t0) / args.iters * 1e3)
        results[bs] = {"fwd_ms": round(ms, 2),
                       "imgs_per_s": round(bs / ms * 1e3, 1),
                       "compile_s": round(compile_s, 1)}
        print(f"B={bs:4d}: {ms:7.2f} ms/forward "
              f"({bs / ms * 1e3:8.1f} imgs/s, compile {compile_s:.1f}s)")

    if 128 in results and 64 in results:
        slow = results[128]["fwd_ms"] / (2 * results[64]["fwd_ms"])
        verdict = "PATHOLOGY PRESENT" if slow > 2 else "pathology absent"
        print(f"B=128 vs 2x B=64 cost ratio: {slow:.2f}x -> {verdict}")
    print(json.dumps({"resolution": args.resolution, "results": results}))


if __name__ == "__main__":
    main()
