#!/usr/bin/env python
"""Secondary benchmark: 2000x2000 tiled canvas replay (BASELINE config 4).

Stylizes a 2000x2000 line drawing with overlap blending and stroke color
control through the batched checkerboard-wave renderer, and reports
canvas-megapixels/sec plus effective patches/sec.
"""

import argparse
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--canvas", type=int, default=2000)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--impl", choices=["ondevice", "host"],
                    default="ondevice",
                    help="ondevice = whole replay as ONE jitted scan; "
                         "host = host-side wave loop")
    ap.add_argument("--feature_blending_level", type=int, default=2)
    ap.add_argument("--gan_checkpoint", default=None,
                    help="Native bundle; random flagship weights if omitted.")
    args = ap.parse_args()

    import jax
    from brushstroke_engine_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    from brushstroke_engine_tpu.ops.precision import set_precision_mode
    from brushstroke_engine_tpu.engine.brush import (
        PaintEngineFactory, TriadGanPaintEngine, GanBrushOptions,
    )
    from brushstroke_engine_tpu.engine.stylize import (
        stylize_image_batched, stylize_image_ondevice,
    )
    from brushstroke_engine_tpu.data.curves import random_spline_stroke

    set_precision_mode("fast")
    if args.gan_checkpoint:
        engine = PaintEngineFactory.create(args.gan_checkpoint)
    else:
        from brushstroke_engine_tpu.flagship import flagship_bundle
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            b = flagship_bundle(img_resolution=args.resolution,
                                num_bf16_res=6)
        dev = jax.devices()[0]
        gp, gs, ep, es = jax.device_put(
            (b.gen_params, b.gen_state, b.enc_params, b.enc_state), dev)
        engine = TriadGanPaintEngine(
            b.gen_cfg, gp, gs, b.enc_cfg, ep, es,
            geom_inject_resolutions=b.geom_inject_resolutions)

    # A large synthetic line drawing.
    rng = np.random.default_rng(0)
    tile = random_spline_stroke(rng, 500)
    reps = args.canvas // 500 + 1
    geom = np.tile(tile, (reps, reps))[:args.canvas, :args.canvas]

    opts = GanBrushOptions()
    opts.set_style(engine.random_style(594), 594)
    opts.set_color(0, np.asarray([40, 60, 160], np.uint8))  # color control

    render = stylize_image_ondevice if args.impl == "ondevice" \
        else stylize_image_batched
    # Warmup (compile the wave batch shapes; the ondevice impl compiles
    # per canvas shape, so warm up at the REAL canvas size).
    warm_geom = geom if args.impl == "ondevice" \
        else geom[:args.resolution * 2, :args.resolution * 2]
    _ = render(
        engine, warm_geom, opts,
        feature_blending_level=args.feature_blending_level,
        batch_size=args.batch_size)

    # Best-of-3: the dev chip is shared and the tunnel jittery; load
    # only ever slows a rep down (same doctrine as bench.py).
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = render(
            engine, geom, opts,
            feature_blending_level=args.feature_blending_level,
            batch_size=args.batch_size, on_white=True)
        dt = min(dt, time.perf_counter() - t0)

    mpix = out.shape[0] * out.shape[1] / 1e6
    stride = args.resolution - 20
    n_tiles = (args.canvas // stride + 1) ** 2
    print(json.dumps({
        "metric": f"{args.canvas}x{args.canvas} canvas replay "
                  f"({args.impl})",
        "seconds": round(dt, 2),
        "canvas_megapixels_per_sec": round(mpix / dt, 2),
        "approx_patches_per_sec": round(n_tiles / dt, 1),
    }))


if __name__ == "__main__":
    main()
