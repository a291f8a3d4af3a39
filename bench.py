#!/usr/bin/env python
"""Headline benchmark: 256px stylized patches/sec/chip.

Renders batches of 256px stroke patches through the full engine path
(geometry encoder -> geometry-conditioned generator -> triad compositing ->
RGBA), i.e. BASELINE.json config "brush-library grid / stylize patch pass",
on whatever accelerator JAX finds (the real TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline denominator: the reference publishes no numbers (BASELINE.md); we
use 25 patches/sec as the PyTorch-GPU estimate for its sequential per-patch
256px render loop (single-image StyleGAN2-ADA 256px inference on a V100-class
GPU runs ~30-60 fps batch-1; the reference path adds the geometry encoder and
per-patch Python/host overhead).  To be replaced by a measured number when a
GPU reference environment is available.
"""

import json
import time

import numpy as np

REF_PATCHES_PER_SEC_GPU = 25.0
BATCH = 16
ITERS = 16
RESOLUTION = 256


def main():
    import jax
    import jax.numpy as jnp

    from brushstroke_engine_tpu.flagship import flagship_bundle
    from brushstroke_engine_tpu.engine.render import render_core
    from brushstroke_engine_tpu.ops.precision import set_precision_mode

    set_precision_mode("fast")
    # Initialize on host CPU: param init is hundreds of small RNG ops, which
    # are latency-bound over the device tunnel; weights transfer once at the
    # first call instead.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # bf16 trunk for the perf path (num_bf16_res=6 -> whole trunk bf16).
        bundle = flagship_bundle(img_resolution=RESOLUTION, num_bf16_res=6)
    # Pin the weights to the accelerator once (otherwise every call re-ships
    # them over the device tunnel).
    dev = jax.devices()[0]
    (bundle.gen_params, bundle.gen_state, bundle.enc_params,
     bundle.enc_state) = jax.device_put(
        (bundle.gen_params, bundle.gen_state, bundle.enc_params,
         bundle.enc_state), dev)

    rng = np.random.RandomState(0)
    geom = (rng.rand(BATCH, RESOLUTION, RESOLUTION, 1) > 0.5).astype(
        np.float32)
    zs = [jnp.asarray(rng.randn(BATCH, bundle.gen_cfg.z_dim), jnp.float32)
          for _ in range(ITERS)]
    positions = rng.randint(0, RESOLUTION, size=(BATCH, 2)).astype(np.int64)

    def call(z):
        return render_core(
            bundle.gen_cfg, bundle.enc_cfg,
            tuple(bundle.geom_inject_resolutions), "clear", (), "triad",
            bundle.gen_params, bundle.gen_state, bundle.enc_params,
            bundle.enc_state, jnp.asarray(geom), z, None,
            jnp.asarray(positions), None, None, None, None, None)

    # Warmup / compile (force real execution with a host transfer: on the
    # tunneled platform block_until_ready does not reliably block).
    float(call(zs[0])["rgba"].sum())

    t0 = time.perf_counter()
    acc = None
    for i in range(ITERS):
        s = call(zs[i])["rgba"].sum()
        acc = s if acc is None else acc + s
    float(acc)
    dt = time.perf_counter() - t0

    patches_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "256px stylized patches/sec/chip",
        "value": round(patches_per_sec, 2),
        "unit": "patches/s",
        "vs_baseline": round(patches_per_sec / REF_PATCHES_PER_SEC_GPU, 2),
    }))


if __name__ == "__main__":
    main()
