#!/usr/bin/env python
"""Component-level roofline microbench for the RENDER (serving) path.

Splits the headline bench.py pipeline -- geometry encode, mapping,
synthesis, triad compositing -- into separately timed on-device loops
and prints ms plus implied TFLOP/s and HBM GB/s from the compiler's own
cost analysis.  Localizes where the 256px stylize pass spends its time
so serving optimizations (e.g. quantization) target the right block.
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
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--int8", action="store_true",
                    help="Route stride-1 synthesis convs through the int8 "
                         "MXU path (ops/quant.py) -- the A/B harness for "
                         "its measured-negative in-situ verdict.")
    ap.add_argument("--int8_static", action="store_true",
                    help="Static-calibration PTQ variant: one eager "
                         "calibration pass records per-call-site "
                         "activation amax, then the timed program bakes "
                         "those scales as constants (no per-conv amax "
                         "reduction). Benchmarks the synthesis blocks "
                         "only.")
    args = ap.parse_args()

    import jax
    from brushstroke_engine_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from brushstroke_engine_tpu.flagship import flagship_bundle
    from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode
    from brushstroke_engine_tpu.models.generator import generator_apply
    from brushstroke_engine_tpu.models.mapping import mapping_apply
    from brushstroke_engine_tpu.ops.precision import set_precision_mode

    set_precision_mode("fast")
    if args.int8:
        from brushstroke_engine_tpu.ops.quant import set_int8_inference
        set_int8_inference(True)
    r, batch = args.resolution, args.batch
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        b = flagship_bundle(img_resolution=r, num_bf16_res=6)
    gp, gs, ep, es = jax.device_put(
        (b.gen_params, b.gen_state, b.enc_params, b.enc_state), dev)
    rng = np.random.RandomState(0)
    geom = jax.device_put(jnp.asarray(
        (rng.rand(batch, r, r, 1) > 0.5).astype(np.float32)), dev)
    z = jax.device_put(jnp.asarray(rng.randn(batch, b.gen_cfg.z_dim),
                                   jnp.float32), dev)
    positions = jax.device_put(jnp.asarray(
        rng.randint(0, r, size=(batch, 2))), dev)
    enc_res = list(b.geom_inject_resolutions)
    gen_cfg, enc_cfg = b.gen_cfg, b.enc_cfg

    feats0 = geo_encoder_encode(enc_cfg, ep, es, geom, res=enc_res)

    # Every device array is threaded through as an ARGUMENT: closing over
    # one embeds it as an HLO constant, which bloats the program shipped
    # to the (tunneled) compiler past its request-size limit.
    env = dict(gp=gp, gs=gs, ep=ep, es=es, geom=geom, z=z,
               positions=positions, feats0=tuple(feats0))

    def loopfloor(e, i):
        return jnp.sum(e["geom"][0, 0, 0] * i)

    def encode(e, i):
        feats = geo_encoder_encode(enc_cfg, e["ep"], e["es"],
                                   e["geom"] * (1.0 + 0.0 * i), res=enc_res)
        return sum(jnp.sum(f) for f in feats)

    def mapping(e, i):
        ws, _ = mapping_apply(gen_cfg.mapping, e["gp"]["mapping"],
                              e["z"] + 0.01 * i, None)
        return jnp.sum(ws)

    def full(e, i):
        img, debug, _ = generator_apply(
            gen_cfg, e["gp"], e["gs"], z=e["z"] + 0.01 * i,
            geom_features=list(e["feats0"]),
            positions=e["positions"], noise_mode="const",
            return_debug_data=True)
        uvs = debug["uvs"]
        colors = (debug["colors"] + 1.0) / 2.0
        stroke = jnp.einsum("bhwk,bck->bhwc", uvs, colors)
        alpha = jnp.sum(uvs[..., :2], axis=-1, keepdims=True)
        return jnp.sum(stroke) + jnp.sum(alpha) + jnp.sum(img)

    def synth_only(e, i):
        img, _, _ = generator_apply(
            gen_cfg, e["gp"], e["gs"], z=e["z"] + 0.01 * i,
            geom_features=list(e["feats0"]),
            positions=e["positions"], noise_mode="const")
        return jnp.sum(img)

    blocks = [("loop floor", loopfloor), ("geometry encode", encode),
              ("mapping", mapping), ("synthesis (z->img)", synth_only),
              ("full render+composite", full)]

    static_int8_scales = None
    if args.int8_static:
        from brushstroke_engine_tpu.ops import quant
        # Eager calibration: ONE pass through the synthesis program
        # records each quantizable call site's activation amax in call
        # order (identical to trace order of the same python code).
        with quant.calibration():
            img, _, _ = generator_apply(
                gen_cfg, gp, gs, z=z, geom_features=list(feats0),
                positions=positions, noise_mode="const")
            jax.block_until_ready(img)
        static_int8_scales = quant.calibrated_scales()
        print(f"# calibrated {len(static_int8_scales)} int8 call sites")
        # Only the synthesis blocks share the calibrated site sequence.
        blocks = [("loop floor", loopfloor),
                  ("synthesis (z->img)", synth_only),
                  ("full render+composite", full)]

    results = []
    floor_ms = 0.0
    for name, fn in blocks:
        def run(e):
            def body(i, acc):
                return acc + fn(e, i)
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        jr = jax.jit(run)
        if static_int8_scales is not None and "loop floor" not in name:
            from brushstroke_engine_tpu.ops import quant
            with quant.static_scales(static_int8_scales):
                float(jr(env))  # trace+compile with baked scales
        else:
            float(jr(env))  # compile+warm
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(jr(env))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        ms = best * 1e3
        if name == "loop floor":
            floor_ms = ms
        results.append({
            "block": name,
            "ms": round(ms, 2),
            "ms_minus_floor": round(max(ms - floor_ms, 0.0), 2),
        })
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"resolution": r, "batch": batch, "blocks": results}))


if __name__ == "__main__":
    main()
