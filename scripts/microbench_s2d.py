#!/usr/bin/env python
"""Space-to-depth A/B for the encoder's stride-2 bottleneck conv.

The sauto encoder's stage-1 conv (3x3 stride-2, 64->128 channels at
256^2 -> 128^2, ~310 GFLOP at B=128) runs at ~56 TF/s on v5e: the strided
input rows and 64-channel contraction underfill the MXU
(docs/ARCHITECTURE.md encoder section).  The classical fix is a
space-to-depth re-layout: fold 2x2 spatial blocks into channels
([B,H,W,C] -> [B,H/2,W/2,4C]) so the conv becomes STRIDE-1 with a 2x2
kernel over 4C=256 input channels -- a better MXU shape bought with
16/9 more FLOPs (the 3x3 taps pad to a 4x4 phase grid = 2x2 kernel x 4
phases).  Round-3 dismissed this as "breaks even at best" without
measuring; this script measures it (both forms validated equal to fp
tolerance first).

Prints one JSON line with both times and the verdict.
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


def s2d_kernel(w):
    """[3,3,C,K] stride-2 kernel -> [2,2,4C,K] stride-1 kernel on the
    space-to-depth input, zero-padding the 3x3 taps onto the 4x4 phase
    grid.  Phase layout matches s2d(): channel block (dy, dx) holds
    x[2i+dy, 2j+dx]."""
    import jax.numpy as jnp
    c, k = w.shape[2], w.shape[3]
    # Strided output i reads x[2i + a - 1], a in 0..2 (pad 1).  On the
    # s2d grid the kernel spans grid rows {i-1, i} (positions p in
    # {0,1}) at phases py in {0,1}: x[2(i-1+p)+py] = x[2i + (2p+py) - 2],
    # so tap a = 2p + py - 1 -- i.e. index (2p+py) into w padded left by
    # one zero row/col.
    w4 = jnp.zeros((4, 4, c, k), w.dtype).at[1:4, 1:4].set(w)
    parts = []
    for dy in range(2):
        row = []
        for dx in range(2):
            # kernel position (dy, dx) on the s2d grid gathers phases
            phase = jnp.stack([w4[2 * dy + py, 2 * dx + px]
                               for py in range(2) for px in range(2)],
                              axis=0)            # [4, C, K]
            row.append(phase.reshape(4 * c, k))  # [4C, K]
        parts.append(jnp.stack(row, axis=0))
    return jnp.stack(parts, axis=0)              # [2, 2, 4C, K]


def s2d(x):
    """[B,H,W,C] -> [B,H/2,W/2,4C]; channel block (dy,dx) = x[2i+dy,2j+dx]."""
    import jax.numpy as jnp
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))     # [B,H/2,W/2,2,2,C]
    return x.reshape(b, h // 2, w // 2, 4 * c)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--cout", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.hw, args.hw, args.cin),
                    dt)
    w = jnp.asarray(0.05 * rng.randn(3, 3, args.cin, args.cout), dt)

    @jax.jit
    def strided(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    @jax.jit
    def s2d_form(x, w):
        xs = s2d(x)
        ws = s2d_kernel(w)
        # 'SAME'-equivalent for the folded grid: the strided conv with
        # pad 1 reads x[2i-1 .. 2i+1]; on the s2d grid that is spatial
        # positions i-1 (phase 1) and i (phases 0,1) -> pad (1, 0) with
        # the 2x2 kernel.
        return jax.lax.conv_general_dilated(
            xs, ws, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    # Equality check ON-DEVICE (downloading two [B,128,128,K] tensors
    # over a tunneled link costs GBs; only the scalar comes back).
    @jax.jit
    def relerr(x, w):
        a = strided(x, w)
        b = s2d_form(x, w)
        return jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-6)

    err = float(relerr(x, w))
    assert err < 2e-2 if args.dtype == "bf16" else err < 1e-5, err

    def timeit(fn):
        fn(x, w).block_until_ready()
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(x, w)
        out.block_until_ready()
        return (time.perf_counter() - t0) / args.iters * 1e3

    ms_strided = timeit(strided)
    ms_s2d = timeit(s2d_form)
    gflop = args.batch * (args.hw // 2) ** 2 * 9 * args.cin * args.cout \
        * 2 / 1e9
    out = {
        "shape": f"B{args.batch} {args.hw}^2 {args.cin}->{args.cout} "
                 f"s2 {args.dtype}",
        "rel_err": float(err),
        "strided_ms": round(ms_strided, 3),
        "s2d_ms": round(ms_s2d, 3),
        "strided_tflops": round(gflop / ms_strided, 1),
        "s2d_effective_tflops": round(gflop / ms_s2d, 1),
        "speedup": round(ms_strided / ms_s2d, 3),
    }
    out["verdict"] = "WIN" if out["speedup"] > 1.1 else (
        "LOSS" if out["speedup"] < 0.95 else "WASH")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
