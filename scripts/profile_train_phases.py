#!/usr/bin/env python
"""Per-phase device timing of the training cycle (roofline hunt).

Times each phase (geometry encode, Dmain, Dr1, Gmain, Gpl, ADA-augment
alone) as its own on-device fori_loop at one or more batch sizes, plus the
full amortized cycle, so the optimization target is visible per phase
instead of as one blended number.  Chained on-device like bench_train.py to
mask the ~100 ms tunnel dispatch latency.
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
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--iters", type=int, default=8)
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
    r = args.resolution
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    results = {}

    for batch in [int(b) for b in args.batches.split(",")]:
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
                                     g_params=b.gen_params,
                                     g_state=b.gen_state)
        state, ep, es = jax.device_put((state, b.enc_params, b.enc_state),
                                       dev)
        rng = np.random.RandomState(0)
        real = jax.device_put(jnp.asarray(rng.randn(batch, r, r, 3),
                                          jnp.float32), dev)
        geom = jax.device_put(jnp.asarray(
            (rng.rand(batch, r, r, 1) > 0.5), jnp.float32), dev)
        feats0 = ts.encode_geometry(cfg, ep, es, geom)
        z = jax.device_put(jnp.asarray(
            rng.randn(batch, cfg.gen_cfg.z_dim), jnp.float32), dev)

        d_main = ts.d_main_step.__wrapped__
        d_reg = ts.d_reg_step.__wrapped__
        g_main = ts.g_main_step.__wrapped__
        g_reg = ts.g_reg_step.__wrapped__

        def timed(name, body_fn, *xs):
            @jax.jit
            def loop(state, key, *xs):
                def body(i, carry):
                    s, k = carry
                    k, sub = jax.random.split(k)
                    s = body_fn(s, sub, *xs)
                    return s, k
                return jax.lax.fori_loop(0, args.iters, body, (state, key))

            out = loop(state, jax.random.PRNGKey(1), *xs)
            jax.block_until_ready(out)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                out = loop(state, jax.random.PRNGKey(2), *xs)
                jax.block_until_ready(out)
                best = min(best, (time.perf_counter() - t0) / args.iters)
            results[f"{name}@B{batch}"] = round(best * 1e3, 2)

        def enc_probe(s, k, geom_x):
            f = ts.encode_geometry(cfg, ep, es, geom_x)
            return dict(s, ada_signs=s["ada_signs"]
                        + 0 * jnp.sum(f[0]).astype(jnp.float32))

        timed("encode", enc_probe, geom)
        timed("dmain", lambda s, k, real_x, f0, zx:
              d_main(cfg, s, real_x, f0, zx, k)[0], real, feats0, z)
        timed("dr1", lambda s, k, real_x: d_reg(cfg, s, real_x, k)[0], real)
        timed("gmain", lambda s, k, f0, gx, zx:
              g_main(cfg, s, f0, gx, zx, k, jnp.float32(0.999))[0],
              feats0, geom, z)
        timed("gpl", lambda s, k, f0, zx:
              g_reg(cfg, s, f0, zx, k, jnp.float32(0.999))[0], feats0, z)
        if cfg.augment is not None:
            def aug_only(s, k, real_x):
                out = augment_pipe(cfg.augment, k, real_x, s["ada_p"])
                return dict(s, ada_signs=s["ada_signs"]
                            + 0 * jnp.sum(out).astype(jnp.float32))
            timed("augment", aug_only, real)

        # Amortized full cycle ms/batch: dmain + gmain + encode + regs/interval
        cyc = (results[f"encode@B{batch}"] + results[f"dmain@B{batch}"]
               + results[f"gmain@B{batch}"]
               + results[f"dr1@B{batch}"] / cfg.d_reg_interval
               + results[f"gpl@B{batch}"] / cfg.g_reg_interval)
        results[f"cycle_ms@B{batch}"] = round(cyc, 2)
        results[f"imgs_per_sec@B{batch}"] = round(batch / cyc * 1e3, 1)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
