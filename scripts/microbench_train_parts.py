#!/usr/bin/env python
"""Component-level roofline microbench for the training cycle.

Times the individual compute blocks a training phase is made of -- G
forward, G forward+backward, D forward, D forward+backward, the ADA
augment pipe, and the R1 double-backward -- each as its own on-device
fori_loop, and prints ms plus implied TFLOP/s from the compiler's own cost
analysis.  This localizes the gap between the render path (~178 TFLOP/s
implied on this chip) and the training phases (~65 TFLOP/s) to specific
blocks instead of blended phase numbers.
"""

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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pallas_warp", action="store_true",
                    help="Route the ADA geometric warp through the fused "
                         "Pallas kernel (ops/pallas_warp.py) in the "
                         "'augment' block as well.")
    args = ap.parse_args()

    import jax
    from brushstroke_engine_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from brushstroke_engine_tpu.ops.precision import set_precision_mode
    from brushstroke_engine_tpu.flagship import (
        flagship_bundle, flagship_discriminator_config,
    )
    from brushstroke_engine_tpu.train.state import (
        TrainConfig, init_train_state,
    )
    from brushstroke_engine_tpu.train.augment import (
        AugmentConfig, augment_pipe,
    )
    from brushstroke_engine_tpu.train import steps as ts

    set_precision_mode("fast")
    r, batch = args.resolution, args.batch
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        b = flagship_bundle(img_resolution=r, num_bf16_res=4)
        cfg = TrainConfig(
            gen_cfg=b.gen_cfg,
            disc_cfg=flagship_discriminator_config(r, num_bf16_res=4),
            enc_cfg=b.enc_cfg, enc_res=(0, 1), batch_size=batch,
            main_phase_losses="", geom_phase_losses="1.0*iou_inv(uvs)",
            augment=AugmentConfig.from_spec("bgc"),
            g_reg_interval=4, d_reg_interval=16)
        state = init_train_state(cfg, jax.random.PRNGKey(0),
                                 g_params=b.gen_params, g_state=b.gen_state)
    state, ep, es = jax.device_put((state, b.enc_params, b.enc_state), dev)
    rng = np.random.RandomState(0)
    real = jax.device_put(jnp.asarray(rng.randn(batch, r, r, 3),
                                      jnp.float32), dev)
    geom = jax.device_put(jnp.asarray((rng.rand(batch, r, r, 1) > 0.5),
                                      jnp.float32), dev)
    feats0 = ts.encode_geometry(cfg, ep, es, geom)
    z = jax.device_put(jnp.asarray(rng.randn(batch, cfg.gen_cfg.z_dim),
                                   jnp.float32), dev)
    ada_p = jnp.float32(0.2)

    def g_fwd(g_params, zz, kk):
        img, _, _ = ts._run_g(cfg, g_params, state, zz, feats0, kk,
                              update_w_avg=False)
        return jnp.sum(img.astype(jnp.float32))

    def g_fwd_bwd(g_params, zz, kk):
        grads = jax.grad(g_fwd)(g_params, zz, kk)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(grads))

    def d_fwd(d_params, img, kk):
        return jnp.sum(ts._run_d(cfg, d_params, img, kk, ada_p)
                       .astype(jnp.float32))

    def d_fwd_noaug(d_params, img, kk):
        import dataclasses
        logits = ts._run_d(dataclasses.replace(cfg, augment=None),
                           d_params, img, kk, ada_p)
        return jnp.sum(logits.astype(jnp.float32))

    def d_fwd_bwd(d_params, img, kk):
        grads = jax.grad(d_fwd)(d_params, img, kk)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(grads))

    def r1_double(d_params, img, kk):
        def d_sum(im):
            return jnp.sum(ts._run_d(cfg, d_params, im, kk, ada_p))
        r1 = jax.grad(d_sum)(img)
        pen = jnp.sum(jnp.square(r1), axis=(1, 2, 3))
        g = jax.grad(lambda p: jnp.mean(
            jnp.sum(jnp.square(jax.grad(
                lambda im: jnp.sum(ts._run_d(cfg, p, im, kk, ada_p)))(img)),
                axis=(1, 2, 3))))(d_params)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(g))

    def aug_only(img, kk):
        return jnp.sum(augment_pipe(cfg.augment, kk, img, ada_p)
                       .astype(jnp.float32))

    def enc_only(gg, kk):
        f = ts.encode_geometry(cfg, ep, es, gg)
        return jnp.sum(f[0].astype(jnp.float32))

    # Isolated geometric-warp A/B: the XLA two-pass (materialized
    # interpolation matrices) vs the fused Pallas kernel (weights built in
    # VMEM).  Same ADA-like transform distribution for both.
    from brushstroke_engine_tpu.train.augment import _affine_warp_twopass
    from brushstroke_engine_tpu.ops.pallas_warp import (
        affine_warp_twopass_pallas, set_pallas_warp_enabled,
    )
    if args.pallas_warp:
        set_pallas_warp_enabled(True)

    def _rand_mats(kk):
        k1, k2, k3 = jax.random.split(kk, 3)
        t = jax.random.uniform(k1, (batch,), minval=-0.8, maxval=0.8)
        s = jnp.exp2(jax.random.normal(k2, (batch, 2)) * 0.2)
        tr = jax.random.uniform(k3, (batch, 2), minval=-0.125,
                                maxval=0.125) * r
        c, sn = jnp.cos(t), jnp.sin(t)
        z0 = jnp.zeros_like(t)
        o = jnp.ones_like(t)
        return jnp.stack([
            jnp.stack([c * s[:, 0], -sn * s[:, 1], tr[:, 0]], -1),
            jnp.stack([sn * s[:, 0], c * s[:, 1], tr[:, 1]], -1),
            jnp.stack([z0, z0, o], -1)], -2)

    def warp_xla(img, kk):
        return jnp.sum(_affine_warp_twopass(img, _rand_mats(kk))
                       .astype(jnp.float32))

    def warp_pallas(img, kk):
        return jnp.sum(affine_warp_twopass_pallas(img, _rand_mats(kk))
                       .astype(jnp.float32))

    def warp_xla_grad(img, kk):
        g = jax.grad(lambda im: warp_xla(im, kk))(img)
        return jnp.sum(g.astype(jnp.float32))

    def warp_pallas_grad(img, kk):
        g = jax.grad(lambda im: warp_pallas(im, kk))(img)
        return jnp.sum(g.astype(jnp.float32))

    blocks = {
        "g_fwd": (g_fwd, (state["g_params"], z)),
        "g_fwd_bwd": (g_fwd_bwd, (state["g_params"], z)),
        "d_fwd": (d_fwd, (state["d_params"], real)),
        "d_fwd_bwd": (d_fwd_bwd, (state["d_params"], real)),
        "r1_double": (r1_double, (state["d_params"], real)),
        "augment": (aug_only, (real,)),
        "encode": (enc_only, (geom,)),
        "warp_xla": (warp_xla, (real,)),
        "warp_xla_grad": (warp_xla_grad, (real,)),
    }
    if r % 128 == 0 and jax.devices()[0].platform == "tpu":
        blocks["warp_pallas"] = (warp_pallas, (real,))
        blocks["warp_pallas_grad"] = (warp_pallas_grad, (real,))

    out = {}
    for name, (fn, xs) in blocks.items():
        @jax.jit
        def loop(key, *xs):
            def body(i, carry):
                acc, k = carry
                k, sub = jax.random.split(k)
                return acc + fn(*xs, sub), k
            return jax.lax.fori_loop(
                0, args.iters, body, (jnp.float32(0.0), key))

        # Cost of ONE application (for TFLOP/s), timed via the loop.
        ca = jax.jit(fn).lower(*xs, jax.random.PRNGKey(0)).compile() \
            .cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        gflops = ca.get("flops", 0) / 1e9
        hbm_gb = ca.get("bytes accessed", 0) / 1e9

        res = loop(jax.random.PRNGKey(1), *xs)
        jax.block_until_ready(res)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            res = loop(jax.random.PRNGKey(2), *xs)
            jax.block_until_ready(res)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        ms = best * 1e3
        out[name] = {
            "ms": round(ms, 2),
            "gflops": round(gflops, 1),
            "tflops_per_s": round(gflops / ms, 1) if ms > 0 else 0,
            "hbm_gb_per_s": round(hbm_gb / ms * 1e3, 0),
        }
        print(f"{name:12s} {out[name]}", file=sys.stderr)

    print(json.dumps({"resolution": r, "batch": batch, "blocks": out},
                     indent=1))


if __name__ == "__main__":
    main()
