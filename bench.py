#!/usr/bin/env python
"""Headline benchmark: 256px stylized patches/sec/chip.

Renders batches of 256px stroke patches through the FULL engine path
(geometry encoder -> geometry-conditioned generator with position-wrapped
noise -> triad compositing -> RGBA), i.e. BASELINE.json config
"brush-library grid / stylize patch pass".

Measurement: the per-patch pipeline runs inside an on-device
``lax.fori_loop`` (new style z each iteration) so the number reflects actual
chip throughput.  This matters doubly in this environment: the dev TPU is
reached through a network tunnel whose per-dispatch latency (~100 ms) would
otherwise swamp the ~5 ms of real compute; production serving batches
dispatches or runs device-side loops exactly like this.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline denominator: the reference publishes no numbers (BASELINE.md); we
use 25 patches/sec as the PyTorch-GPU estimate for its sequential per-patch
256px render loop (single-image StyleGAN2-ADA 256px inference on a V100-class
GPU runs ~30-60 fps batch-1; the reference path adds the geometry encoder and
per-patch Python/host overhead).  To be replaced by a measured number when a
GPU reference environment is available.
"""

import importlib.util
import json
import os
import time

# The persistent-compile-cache loader logs a benign machine-feature
# mismatch for host-side XLA:CPU AOT results ("could lead to SIGILL",
# emitted at ERROR level by cpu_aot_loader) that pollutes the recorded
# bench tail; silence C++ logs before anything imports jax.  Harmless
# here: the bench runs on the TPU backend, host CPU programs are tiny,
# and real failures still surface as Python exceptions.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


def _install_stderr_filter():
    """Drop the XLA:CPU AOT-loader machine-feature dump from fd 2.

    TF_CPP_MIN_LOG_LEVEL and per-host cache salting (rounds 3-4) did not
    silence it: the loader compares the compile-time LLVM feature string
    (which embeds program-dependent tuning flags like +prefer-no-scatter)
    against the detected host features, so the exact-match check false-
    positives even for same-host cache loads.  The warning is benign for
    this bench (all hot programs run on the TPU backend); filter it at
    the file-descriptor level so the recorded artifact tail stays clean
    while every other stderr line (exceptions, real XLA errors) passes
    through.  Opt out with BSE_BENCH_RAW_STDERR=1.
    """
    if os.environ.get("BSE_BENCH_RAW_STDERR"):
        return
    import re
    import threading
    drop = re.compile(rb"machine features|SIGILL")
    orig_fd = os.dup(2)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)

    def pump():
        buf = b""
        while True:
            try:
                chunk = os.read(r, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for ln in lines:
                if not drop.search(ln):
                    os.write(orig_fd, ln + b"\n")
        if buf and not drop.search(buf):
            os.write(orig_fd, buf)

    threading.Thread(target=pump, daemon=True).start()


_install_stderr_filter()

import numpy as np

REF_PATCHES_PER_SEC_GPU = 25.0
# Batch 128 saturates the v5e chip for this pipeline (synthesis-only batch
# sweep: B=16 2411, B=32 2742, B=64 2957, B=128 4067, B=256 4075 patches/s;
# the honest full-pipeline number at B=128 is ~2953); production serving
# batches tile renders exactly like this.
BATCH = 128
LOOP_ITERS = 32
RESOLUTION = 256


def main():
    import jax
    from brushstroke_engine_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from brushstroke_engine_tpu.flagship import flagship_bundle
    from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode
    from brushstroke_engine_tpu.models.generator import generator_apply
    from brushstroke_engine_tpu.ops.precision import set_precision_mode

    set_precision_mode("fast")
    # Initialize on host CPU: param init is hundreds of small RNG ops, which
    # are latency-bound over the device tunnel; ship the trees once.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        bundle = flagship_bundle(img_resolution=RESOLUTION, num_bf16_res=6)
    dev = jax.devices()[0]
    gp, gs, ep, es = jax.device_put(
        (bundle.gen_params, bundle.gen_state, bundle.enc_params,
         bundle.enc_state), dev)

    rng = np.random.RandomState(0)
    geom = jax.device_put(jnp.asarray(
        (rng.rand(BATCH, RESOLUTION, RESOLUTION, 1) > 0.5)
        .astype(np.float32)), dev)
    z0 = jax.device_put(jnp.asarray(
        rng.randn(BATCH, bundle.gen_cfg.z_dim), jnp.float32), dev)
    positions = jax.device_put(jnp.asarray(
        rng.randint(0, RESOLUTION, size=(BATCH, 2))), dev)
    gen_cfg, enc_cfg = bundle.gen_cfg, bundle.enc_cfg
    enc_res = list(bundle.geom_inject_resolutions)

    @jax.jit
    def render_many(gp, gs, ep, es, z0, geom, positions):
        def body(i, acc):
            # Full pipeline per iteration: encode + synthesize + composite.
            # The geometry must DEPEND on the loop index: with an invariant
            # `geom`, XLA hoists the entire encoder out of the loop and the
            # benchmark silently measures synthesis only (caught in round 3
            # by scripts/microbench_render_parts.py: synthesis alone timed
            # within 2 ms of the "full" pipeline).  Production stylize/
            # serving encodes fresh geometry for every patch.
            geom_i = jnp.roll(geom, i, axis=0)
            feats = geo_encoder_encode(enc_cfg, ep, es, geom_i, res=enc_res)
            z = z0 + (0.01 * i)
            img, debug, _ = generator_apply(
                gen_cfg, gp, gs, z=z, geom_features=feats,
                positions=positions, noise_mode="const",
                return_debug_data=True)
            uvs = debug["uvs"]
            colors = (debug["colors"] + 1.0) / 2.0
            stroke = jnp.einsum("bhwk,bck->bhwc", uvs, colors)
            alpha = jnp.sum(uvs[..., :2], axis=-1, keepdims=True)
            rgba = jnp.concatenate([stroke, alpha], axis=-1)
            return acc + rgba.sum()

        return jax.lax.fori_loop(0, LOOP_ITERS, body, jnp.float32(0))

    # Warmup/compile (forced with a host transfer: block_until_ready does not
    # reliably block on the tunneled platform).
    float(render_many(gp, gs, ep, es, z0, geom, positions))

    # Best of 3 timed reps: the dev-TPU tunnel adds run-to-run jitter that
    # only ever slows a rep down, so max throughput is the faithful reading.
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(render_many(gp, gs, ep, es, z0, geom, positions))
        dt = time.perf_counter() - t0
        best = max(best, BATCH * LOOP_ITERS / dt)

    patches_per_sec = best

    # Optional-quality mode: static-calibration int8 PTQ on the synthesis
    # stack (ops/quant.py; PSNR>25 dB vs bf16, tests/test_quant.py).  Same
    # loop, scales baked as constants; reported as a separate field so the
    # headline stays the full-quality bf16 number.
    int8_extra = {}
    try:
        from brushstroke_engine_tpu.ops import quant

        def one_pass():
            feats = geo_encoder_encode(enc_cfg, ep, es, geom, res=enc_res)
            img, debug, _ = generator_apply(
                gen_cfg, gp, gs, z=z0, geom_features=feats,
                positions=positions, noise_mode="const",
                return_debug_data=True)
            return img

        scales = quant.eager_calibrate(one_pass)
        qscales = tuple(float(1.25 * s) for s in scales)

        # The scales MUST ride the jit cache key as a static argument
        # (mirroring engine/render.py:render_core).  Re-jitting
        # render_many.__wrapped__ under a static_scales() context does
        # NOT work: JAX's trace cache is keyed on the underlying
        # function object, so the second jit silently reuses the bf16
        # executable compiled above and the "int8" timing measures bf16
        # again (this exact bug shipped in the first round-4 version of
        # this field, which matched bf16 to 0.06%; caught and fixed
        # before BENCH_r04 was recorded).
        def _render_many_int8(gp, gs, ep, es, z0, geom, positions, qscales):
            with quant.static_ctx(list(qscales)):
                return render_many.__wrapped__(
                    gp, gs, ep, es, z0, geom, positions)

        render_many_q = jax.jit(_render_many_int8, static_argnames="qscales")
        float(render_many_q(gp, gs, ep, es, z0, geom, positions,
                            qscales=qscales))
        if quant.sites_consumed() == 0:
            raise RuntimeError(
                "int8 trace engaged no quantized conv; gate regressed")
        best_q = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(render_many_q(gp, gs, ep, es, z0, geom, positions,
                                qscales=qscales))
            best_q = max(best_q,
                         BATCH * LOOP_ITERS / (time.perf_counter() - t0))
        int8_extra = {"patches_per_sec_int8_static": round(best_q, 2)}
    except Exception as e:
        int8_extra = {"int8_static_error": str(e)[:200]}

    # Secondary contract: per-stroke latency (BASELINE target <30 ms p50),
    # measured on the device-resident painting session and reusing this
    # process's bundle + device params.  Failure must not sink the headline.
    latency = {}
    try:
        spec = importlib.util.spec_from_file_location(
            "bench_latency", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts", "bench_latency.py"))
        bl = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bl)
        stats = bl.measure_latency(resolution=RESOLUTION, strokes=16,
                                   reps=3, bundle=bundle,
                                   device_params=(gp, gs, ep, es))
        latency = {
            "latency_ms_p50": stats["device_ms_p50"],
            "latency_ms_p99": stats["device_ms_p99"],
            "latency_target_ms": stats["target_ms"],
        }
    except Exception as e:
        latency = {"latency_error": str(e)[:200]}

    # Tertiary contract: per-stroke round trip at the WEBSOCKET boundary
    # (real tornado server + protocol codec, in-process, device-canvas
    # path) -- what a painter feels.  In this dev environment the value
    # includes the host<->chip network tunnel (~28 ms/round trip floor);
    # co-located serving sees the device+protocol cost only.
    ws = {}
    try:
        # Uncontended floor first (1 session): the co-located SLO argument
        # lives in this artifact, not in PARITY prose — ws1_server_p50_ms
        # is the expected co-located per-stroke latency (queue ~0, render
        # = device + protocol), while ws1_p50_ms adds this dev env's
        # host<->chip tunnel round trip.
        ws1 = measure_ws_slo(bundle, sessions=1, strokes=48, warmup=8)
        ws.update({("ws1" + k[2:]): v for k, v in ws1.items()
                   if k.startswith("ws_") and k != "ws_sessions"})
        # Headline contended config: cross-session DEVICE-CANVAS batching
        # (ui/server.py:DeviceRenderBatcher) — all sessions' strokes in one
        # pooled dispatch per flush window, so contended latency tracks the
        # single-session floor instead of growing linearly with sessions.
        ws.update(measure_ws_slo(bundle, sessions=8, strokes=136, warmup=8,
                                 batch_window_ms=4.0))
        ws["ws_batch_window_ms"] = 4.0
        # A/B: the round-4 serialized path (one dispatch per session per
        # stroke) under the same 8-session contention.
        ws_serial = measure_ws_slo(bundle, sessions=8, strokes=72, warmup=8)
        for k in ("ws_p50_ms", "ws_p99_ms", "ws_render_p50_ms"):
            if k in ws_serial:
                ws["ws_serial" + k[2:]] = ws_serial[k]
    except Exception as e:
        ws["ws_error"] = str(e)[:200]

    print(json.dumps({
        "metric": "256px stylized patches/sec/chip",
        "value": round(patches_per_sec, 2),
        "unit": "patches/s",
        "vs_baseline": round(patches_per_sec / REF_PATCHES_PER_SEC_GPU, 2),
        # The denominator is an estimate (the reference publishes no
        # numbers and no GPU is available here); see module docstring.
        "baseline_kind": "estimate",
        **int8_extra,
        **latency,
        **ws,
    }))


def measure_ws_slo(bundle, sessions=2, strokes=12, warmup=4,
                   batch_window_ms=0.0):
    """End-to-end websocket SLO: run the REAL server app in-process on an
    ephemeral port, drive concurrent painter sessions over real
    websockets (device-canvas path), and report per-stroke round-trip
    percentiles at the protocol boundary.

    ``batch_window_ms`` > 0 enables the cross-session device-canvas
    batcher (the production multi-user config): concurrent sessions'
    strokes coalesce into one pooled dispatch per flush window."""
    import asyncio
    import socket

    from brushstroke_engine_tpu.engine.brush import TriadGanPaintEngine
    from brushstroke_engine_tpu.ui import protocol, server as ui_server

    engine = TriadGanPaintEngine(
        bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
        bundle.enc_cfg, bundle.enc_params, bundle.enc_state,
        geom_inject_resolutions=bundle.geom_inject_resolutions)
    # batch_window_ms=0: serialized device-canvas path (one dispatch per
    # session per stroke, round-4 architecture) — the uncontended floor and
    # the A/B denominator.  batch_window_ms>0: DeviceRenderBatcher pools
    # all sessions' strokes into one dispatch per window (production
    # multi-user config).  The host-path RenderBatcher note from round 3
    # (window only added latency in-process) does not apply here: the
    # device batcher amortizes the ~28 ms tunnel round trip itself, which
    # is exactly what serialized contention pays per stroke.
    app = ui_server.create_server(None, None, paint_engine=engine,
                                  use_device_canvas=True,
                                  batch_window_ms=batch_window_ms)
    if app.dev_batcher is not None:
        # Pre-compile the pooled render for this canvas config and the
        # power-of-two batch buckets, so compiles never land mid-measurement.
        app.dev_batcher.warmup(1024, 1024, level=2, buckets=(1, 2, 4, 8))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    pw = engine.patch_width
    patch = np.zeros((pw, pw, 4), np.uint8)
    yy = (pw / 2 + (pw / 3) * np.sin(np.linspace(0, 2 * np.pi, pw))) \
        .astype(int)
    for x, y in enumerate(yy):
        patch[max(0, y - 3):min(pw, y + 3), x, 3] = 255

    async def drive(sid, out):
        import json as _json

        import tornado.websocket
        ws = await tornado.websocket.websocket_connect(
            f"ws://127.0.0.1:{port}/websocket/")
        for _ in range(2):
            await ws.read_message()
        ws.write_message(_json.dumps({"type": "set_option",
                                      "option": "positions", "value": True}))
        ws.write_message(_json.dumps({"type": "set_option",
                                      "option": "timing", "value": True}))
        ws.write_message(_json.dumps({"type": "new_canvas", "rows": 1024,
                                      "cols": 1024, "feature_blending": 2}))
        rng = np.random.RandomState(100 + sid)
        for i in range(strokes):
            x = int(rng.randint(0, 1024 - pw))
            y = int(rng.randint(0, 1024 - pw))
            t0 = time.perf_counter()
            ws.write_message(protocol.encode_render_request(
                patch, x, y, 0, 0, [], 0), binary=True)
            while True:
                raw = await ws.read_message()
                if isinstance(raw, (bytes, bytearray)):
                    protocol.decode_render_response(raw)
                    break
            rtt = (time.perf_counter() - t0) * 1e3
            # Server-side timing side-channel follows the binary response.
            timing = None
            raw = await ws.read_message()
            if isinstance(raw, str):
                msg = _json.loads(raw)
                if msg.get("type") == "timing":
                    timing = msg["data"]
            if i >= warmup:
                out.append((rtt, timing))
        ws.close()

    async def run():
        srv = app.listen(port, address="127.0.0.1")
        out = []
        try:
            # Hard cap so a wedged session can never hang the driver's
            # bench run; partial results still report.
            await asyncio.wait_for(
                asyncio.gather(*[drive(s, out) for s in range(sessions)]),
                timeout=600)
        except asyncio.TimeoutError:
            pass
        finally:
            srv.stop()
        return out

    samples = asyncio.run(run())
    if not samples:
        return {"ws_error": "no strokes completed within timeout"}
    times = np.asarray([rtt for rtt, _ in samples])
    res = {
        "ws_p50_ms": round(float(np.percentile(times, 50)), 2),
        "ws_p99_ms": round(float(np.percentile(times, 99)), 2),
        "ws_sessions": sessions,
        "ws_strokes_measured": int(times.size),
    }
    # Decomposition from the server's per-stroke timing side-channel:
    # the in-process loopback has ~0 wire cost, so over the dev tunnel
    # server_ms isolates the chip round trip from the wire and a
    # co-located deployment's expected latency is server_* directly.
    timed = [(rtt, t) for rtt, t in samples if t is not None]
    if timed:
        sv = np.asarray([t["server_ms"] for _, t in timed])
        rd = np.asarray([t["render_ms"] for _, t in timed])
        res.update({
            "ws_server_p50_ms": round(float(np.percentile(sv, 50)), 2),
            "ws_server_p99_ms": round(float(np.percentile(sv, 99)), 2),
            "ws_render_p50_ms": round(float(np.percentile(rd, 50)), 2),
        })
    return res


if __name__ == "__main__":
    main()
