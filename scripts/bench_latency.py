#!/usr/bin/env python
"""Secondary benchmark: interactive per-stroke latency (<30 ms p50 target).

Measures the device-resident painting session: each stroke is ONE jitted
dispatch (encode + synthesize with canvas feature blending + composite +
canvas write-back), with consecutive strokes chained through the donated
canvas state.  Reports amortized per-stroke device time over a chain of
strokes (on the tunneled dev chip host->device dispatch adds latency that
does not exist in production serving); percentiles are taken over repeated
chains, which is the host-observable granularity on a tunneled chip.

``measure_latency`` is also consumed by the repo-root ``bench.py`` so the
driver-recorded benchmark carries the latency contract.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def measure_latency(resolution=256, strokes=32, canvas=2048, reps=3,
                    bundle=None, device_params=None):
    """Returns a dict with per-stroke latency stats (ms).

    ``bundle``/``device_params``: optionally reuse an already-built flagship
    bundle and its device-resident (gp, gs, ep, es) trees (bench.py passes
    its own to avoid double init).
    """
    import jax
    from brushstroke_engine_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from brushstroke_engine_tpu.ops.precision import set_precision_mode
    from brushstroke_engine_tpu.flagship import flagship_bundle
    from brushstroke_engine_tpu.engine.brush import (
        TriadGanPaintEngine, GanBrushOptions,
    )
    from brushstroke_engine_tpu.engine.device_canvas import (
        DevicePaintSession, render_stroke_step,
    )
    from brushstroke_engine_tpu.data.curves import random_spline_stroke

    set_precision_mode("fast")
    dev = jax.devices()[0]
    if bundle is None:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            bundle = flagship_bundle(img_resolution=resolution,
                                     num_bf16_res=6)
    b = bundle
    if device_params is None:
        device_params = jax.device_put(
            (b.gen_params, b.gen_state, b.enc_params, b.enc_state), dev)
    gp, gs, ep, es = device_params
    engine = TriadGanPaintEngine(
        b.gen_cfg, gp, gs, b.enc_cfg, ep, es,
        geom_inject_resolutions=b.geom_inject_resolutions)

    sess = DevicePaintSession(engine, canvas, canvas,
                              feature_blending_level=2)
    opts = GanBrushOptions()
    opts.set_style(engine.random_style(594), 594)

    rng = np.random.default_rng(0)
    w = engine.patch_width
    patches = []
    for _ in range(8):
        g = random_spline_stroke(rng, w)
        p = np.zeros((w, w, 4), np.uint8)
        p[..., 3] = ((1 - g) * 255).astype(np.uint8)
        patches.append(p)

    # Warmup / compile of the interactive per-dispatch path.
    sess.render_stroke(patches[0], opts, x=0, y=0)

    xs = rng.integers(0, canvas - w, size=strokes)
    ys = rng.integers(0, canvas - w, size=strokes)
    t0 = time.perf_counter()
    for i in range(strokes):
        img, _ = sess.render_stroke(patches[i % 8], opts,
                                    x=int(xs[i]), y=int(ys[i]))
    # img of the last stroke is already a host numpy array (sync point).
    dt = time.perf_counter() - t0
    per_stroke_tunnel_ms = dt / strokes * 1e3

    # --- pure device latency: chain strokes inside one jitted fori_loop ---
    down = sess.down
    geom_stack = jnp.asarray(np.stack(
        [1.0 - p[..., 3:4].astype(np.float32) / 255.0 for p in patches]))
    pos_arr = jnp.asarray(np.stack(
        [(ys // down) * down, (xs // down) * down], axis=1))
    z = jnp.asarray(opts.style_z, jnp.float32)
    params = (gp, gs, ep, es)
    step = render_stroke_step.__wrapped__

    import jax

    @jax.jit
    def chain(canvas_state, geom_stack, pos_arr, z):
        def body(i, carry):
            canvas_state, acc = carry
            geom = jax.lax.dynamic_index_in_dim(geom_stack, i % 8,
                                                keepdims=True)[0][None]
            rgba, canvas_state = step(
                b.gen_cfg, b.enc_cfg, tuple(b.geom_inject_resolutions),
                "clear", sess.blend_res, sess.blend_margin,
                sess.crop_margin, params, canvas_state, geom, pos_arr[i], z,
                None, None, None)
            return canvas_state, acc + rgba.sum()

        canvas_state, acc = jax.lax.fori_loop(0, strokes, body,
                                              (canvas_state, jnp.float32(0)))
        return acc

    float(chain(sess.canvas, geom_stack, pos_arr, z))  # compile
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(sess.canvas, geom_stack, pos_arr, z))
        samples.append((time.perf_counter() - t0) / strokes * 1e3)
    samples = np.asarray(samples)

    return {
        "device_ms_per_stroke": round(float(np.median(samples)), 2),
        "device_ms_p50": round(float(np.percentile(samples, 50)), 2),
        "device_ms_p99": round(float(np.percentile(samples, 99)), 2),
        "with_tunnel_dispatch_ms": round(per_stroke_tunnel_ms, 2),
        "target_ms": 30,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--strokes", type=int, default=32)
    ap.add_argument("--canvas", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    stats = measure_latency(resolution=args.resolution,
                            strokes=args.strokes, canvas=args.canvas,
                            reps=args.reps)
    stats["metric"] = (f"per-stroke latency ({args.resolution}px, "
                       f"device canvas)")
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
