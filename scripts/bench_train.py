#!/usr/bin/env python
"""Secondary benchmark: GAN training throughput (imgs/sec/chip).

Runs the fused train step (Dmain + lazy R1 + Gmain + lazy path-length, with
ADA augmentation and geometry losses) at the flagship 128px configuration,
chained on-device so the number reflects chip throughput.  The reference
trains ~10000 kimg in ~2 weeks on one GPU (~8.3 imgs/s, README.md:106);
this prints our imgs/sec and the projected wall-clock for the same run.
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
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--production_loop", action="store_true",
                    help="Drive the REAL TrainingLoop (host data feed, "
                         "fused one-dispatch step, tick machinery) instead "
                         "of the device-chained fori_loop: measures the "
                         "production path including every host cost.")
    ap.add_argument("--pallas_warp", action="store_true",
                    help="Enable the fused Pallas ADA-warp kernel.")
    ap.add_argument("--data_mode", default="pool",
                    choices=["pool", "real_decode", "device_banks"],
                    help="production_loop feed: 'pool' = pre-decoded "
                         "rotating host batches (no decode cost), "
                         "'real_decode' = PNG zips through "
                         "ImageFolderDataset/BatchIterator (the true "
                         "host-fed production path), 'device_banks' = "
                         "uint8 banks in HBM with on-chip sampling "
                         "(train/device_dataset.py).")
    ap.add_argument("--steps_per_dispatch", type=int, default=1,
                    help="device_banks mode: batches per dispatch "
                         "(lax.scan chunk; all per-step randomness "
                         "on-device).")
    ap.add_argument("--snapshot_ticks", type=int, default=100,
                    help="production_loop: persistence cadence in ticks "
                         "(matches the train CLI --snap default). 1 "
                         "reproduces the round-4 per-tick persistence "
                         "pathology (127-219 imgs/s through the tunnel).")
    ap.add_argument("--num_bf16_res", type=int, default=4,
                    help="Run G/D in bf16 at the N highest resolutions "
                         "(4 = the reference 'auto' fp16 spec; 99 = whole "
                         "net bf16, a TPU-only experiment).")
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
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # num_bf16_res=4: reference 'auto' config trains with fp16 at the
        # 4 highest resolutions (train.py cfg specs); bf16 is the TPU analog.
        b = flagship_bundle(img_resolution=args.resolution,
                            num_bf16_res=args.num_bf16_res)
        cfg = TrainConfig(
            gen_cfg=b.gen_cfg,
            disc_cfg=flagship_discriminator_config(
                args.resolution, num_bf16_res=args.num_bf16_res),
            enc_cfg=b.enc_cfg, enc_res=(0, 1), batch_size=args.batch,
            main_phase_losses="", geom_phase_losses="1.0*iou_inv(uvs)",
            augment=AugmentConfig.from_spec("bgc"),
            g_reg_interval=4, d_reg_interval=16)
        state = init_train_state(cfg, jax.random.PRNGKey(0),
                                 g_params=b.gen_params, g_state=b.gen_state)
    if args.pallas_warp:
        from brushstroke_engine_tpu.ops.pallas_warp import \
            set_pallas_warp_enabled
        set_pallas_warp_enabled(True)
    if args.production_loop:
        _run_production_loop(args, cfg, b)
        return
    dev = jax.devices()[0]
    state, ep, es = jax.device_put((state, b.enc_params, b.enc_state), dev)

    n = args.batch
    r = args.resolution
    rng = np.random.RandomState(0)
    real = jax.device_put(jnp.asarray(rng.randn(n, r, r, 3), jnp.float32),
                          dev)
    geom = jax.device_put(jnp.asarray(
        (rng.rand(n, r, r, 1) > 0.5), jnp.float32), dev)

    d_main = ts.d_main_step.__wrapped__
    d_reg = ts.d_reg_step.__wrapped__
    g_main = ts.g_main_step.__wrapped__
    g_reg = ts.g_reg_step.__wrapped__

    @jax.jit
    def run_steps(state, real, geom, key):
        def body(i, carry):
            state, key = carry
            # Encode INSIDE the loop: real training encodes fresh geometry
            # every batch (loop.py), so the number must include it.  Roll
            # the batch by the loop index or XLA hoists the (invariant)
            # encoder out of the loop entirely; --production_loop measures
            # the real host-fed TrainingLoop and needs no such care.
            geom_i = jnp.roll(geom, i, axis=0)
            real_i = jnp.roll(real, i, axis=0)
            feats = ts.encode_geometry(cfg, ep, es, geom_i)
            key, k1, k2, k3, k4, kz1, kz2 = jax.random.split(key, 7)
            z1 = jax.random.normal(kz1, (n, cfg.gen_cfg.z_dim))
            z2 = jax.random.normal(kz2, (n, cfg.gen_cfg.z_dim))
            state, _ = d_main(cfg, state, real_i, feats, z1, k1)

            def dreg(s):
                s2, _ = d_reg(cfg, s, real_i, k2)
                return s2

            state = jax.lax.cond(i % cfg.d_reg_interval == 0, dreg,
                                 lambda s: s, state)
            state, _ = g_main(cfg, state, feats, geom_i, z2, k3,
                              jnp.float32(0.999))

            def greg(s):
                s2, _ = g_reg(cfg, s, feats, z2, k4, jnp.float32(0.999))
                return s2

            state = jax.lax.cond(i % cfg.g_reg_interval == 0, greg,
                                 lambda s: s, state)
            return state, key

        state, _ = jax.lax.fori_loop(0, args.steps, body,
                                     (state, key))
        return state

    state2 = run_steps(state, real, geom, jax.random.PRNGKey(1))
    float(jax.tree_util.tree_leaves(state2["g_params"])[0].sum())  # sync

    t0 = time.perf_counter()
    state3 = run_steps(state2, real, geom, jax.random.PRNGKey(2))
    float(jax.tree_util.tree_leaves(state3["g_params"])[0].sum())
    dt = time.perf_counter() - t0

    imgs_per_sec = args.batch * args.steps / dt
    days_for_10000kimg = 10000e3 / imgs_per_sec / 86400
    print(json.dumps({
        "metric": f"train imgs/sec/chip ({args.resolution}px, batch "
                  f"{args.batch}, full phase cycle)",
        "value": round(imgs_per_sec, 1),
        "projected_days_for_10000kimg": round(days_for_10000kimg, 2),
        "reference": "~2 weeks on 1 GPU (README.md:106)",
    }))


def _run_production_loop(args, cfg, b):
    """Time the real TrainingLoop end-to-end: BatchIterator-style host
    feed, fused single-dispatch step, deferred stat readback, tick
    machinery -- the number production training actually sees."""
    import tempfile
    import time as _time

    import jax
    from brushstroke_engine_tpu.train.loop import TrainingLoop

    n, r = args.batch, args.resolution
    rng = np.random.RandomState(0)
    style_pool = (rng.rand(4, n, r, r, 3) * 255).astype(np.uint8)
    geom_pool = (rng.rand(4, n, r + 32, r + 32, 3) * 255).astype(np.uint8)

    class PoolIter:
        def __init__(self, pool):
            self.pool, self.i = pool, 0

        def __next__(self):
            self.i += 1
            return self.pool[self.i % len(self.pool)]

    style_iter, geom_iter, banks = \
        PoolIter(style_pool), PoolIter(geom_pool), None
    if args.data_mode == "real_decode":
        style_iter, geom_iter = _real_zip_iters(r, n)
    elif args.data_mode == "device_banks":
        from brushstroke_engine_tpu.train.dataset import (
            SyntheticGeometryDataset)
        from brushstroke_engine_tpu.train.device_dataset import (
            build_device_banks)

        class _ArrDS:
            def __init__(self, a):
                self.a = a

            def __len__(self):
                return len(self.a)

            def __getitem__(self, i):
                return self.a[i]

        style_bank = (np.random.RandomState(1)
                      .rand(512, r, r, 3) * 255).astype(np.uint8)
        banks = build_device_banks(_ArrDS(style_bank),
                                   SyntheticGeometryDataset(r + 32,
                                                            size=256))
        style_iter = geom_iter = None

    steps = max(args.steps, 16)
    with tempfile.TemporaryDirectory() as run_dir:
        # kimg_per_tick sized so the timed window ends on exactly ONE tick:
        # per-batch host overhead is included, tick persistence (snapshot
        # write + stat readback) is amortized over the whole window.
        import dataclasses
        cfg = dataclasses.replace(
            cfg, kimg_per_tick=max(steps * n // 1000, 1), ema_kimg=10.0)
        loop = TrainingLoop(cfg, b.enc_params, b.enc_state,
                            style_iter, geom_iter,
                            run_dir=run_dir, seed=0, use_fused=True,
                            device_banks=banks,
                            steps_per_dispatch=args.steps_per_dispatch,
                            snapshot_ticks=args.snapshot_ticks)
        loop.run(total_kimg=2 * n / 1000.0)       # warmup: compile + cache
        nimg0 = loop.cur_nimg  # chunked dispatch may overshoot the warmup
        t0 = _time.perf_counter()
        loop.run(total_kimg=(nimg0 + steps * n) / 1000.0)
        dt = _time.perf_counter() - t0
        imgs = loop.cur_nimg - nimg0
    imgs_per_sec = imgs / dt
    spd = args.steps_per_dispatch
    print(json.dumps({
        "metric": f"production-loop train imgs/sec/chip ({r}px, batch {n}, "
                  f"fused step, data_mode={args.data_mode}"
                  + (f", steps_per_dispatch={spd}" if spd > 1 else "") + ")",
        "value": round(imgs_per_sec, 1),
        "pallas_warp": bool(args.pallas_warp),
        "projected_days_for_10000kimg": round(
            10000e3 / imgs_per_sec / 86400, 2),
        "reference": "~2 weeks on 1 GPU (README.md:106)",
    }))


def _real_zip_iters(r, batch):
    """Style + triband PNG zips (built once, cached in /tmp) through the
    production ImageFolderDataset/BatchIterator path -- includes the real
    per-batch decode cost the 'pool' mode excludes."""
    import io
    import zipfile

    from PIL import Image

    from brushstroke_engine_tpu.train.dataset import (
        BatchIterator, ImageFolderDataset, SyntheticGeometryDataset)

    def ensure_zip(path, images):
        if os.path.exists(path):
            return
        with zipfile.ZipFile(path, "w") as z:
            for i, img in enumerate(images):
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                z.writestr(f"img{i:05d}.png", buf.getvalue())

    rng = np.random.RandomState(7)
    style_zip = f"/tmp/bench_style_{r}.zip"
    geom_zip = f"/tmp/bench_geom_{r}.zip"
    ensure_zip(style_zip, ((rng.rand(r, r, 3) * 255).astype(np.uint8)
                           for _ in range(512)))
    geo_ds = SyntheticGeometryDataset(r + 32, size=256)
    ensure_zip(geom_zip, (geo_ds[i] for i in range(len(geo_ds))))
    style = ImageFolderDataset(style_zip, r, channels=3)
    geom = ImageFolderDataset(geom_zip, r + 32, channels=3)
    return (BatchIterator(style, batch, seed=0),
            BatchIterator(geom, batch, seed=1))


if __name__ == "__main__":
    main()
