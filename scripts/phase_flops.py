#!/usr/bin/env python
"""XLA cost analysis (FLOPs, bytes accessed) per training phase.

Lowers+compiles each phase step for the current backend and prints the
compiler's own flop/byte estimates, so measured phase times (from
profile_train_phases.py) convert into implied TFLOP/s and HBM GB/s per
phase -- the roofline argument per phase instead of one blended number.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--batch", type=int, default=64)
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
    from brushstroke_engine_tpu.train.augment import AugmentConfig
    from brushstroke_engine_tpu.train import steps as ts

    set_precision_mode("fast")
    r, batch = args.resolution, args.batch
    cpu = jax.devices("cpu")[0]
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
        ep, es = b.enc_params, b.enc_state

    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(batch, r, r, 3), jnp.float32)
    geom = jnp.asarray((rng.rand(batch, r, r, 1) > 0.5), jnp.float32)
    z = jnp.asarray(rng.randn(batch, cfg.gen_cfg.z_dim), jnp.float32)
    feats0 = jax.eval_shape(
        lambda g: ts.encode_geometry(cfg, ep, es, g), geom)
    feats0 = [jnp.zeros(f.shape, f.dtype) for f in feats0]
    key = jax.random.PRNGKey(1)
    beta = jnp.float32(0.999)

    phases = {
        "encode": (lambda g: ts.encode_geometry(cfg, ep, es, g), (geom,)),
        "dmain": (lambda s, rl, f, zx, k:
                  ts.d_main_step.__wrapped__(cfg, s, rl, f, zx, k),
                  (state, real, feats0, z, key)),
        "dr1": (lambda s, rl, k: ts.d_reg_step.__wrapped__(cfg, s, rl, k),
                (state, real, key)),
        "gmain": (lambda s, f, g, zx, k:
                  ts.g_main_step.__wrapped__(cfg, s, f, g, zx, k, beta),
                  (state, feats0, geom, z, key)),
        "gpl": (lambda s, f, zx, k:
                ts.g_reg_step.__wrapped__(cfg, s, f, zx, k, beta),
                (state, feats0, z, key)),
    }
    out = {}
    for name, (fn, xs) in phases.items():
        compiled = jax.jit(fn).lower(*xs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out[name] = {
            "gflops": round(ca.get("flops", 0) / 1e9, 1),
            "hbm_gb": round(ca.get("bytes accessed", 0) / 1e9, 3),
        }
    print(json.dumps({"resolution": r, "batch": batch, "phases": out},
                     indent=1))


if __name__ == "__main__":
    main()
