#!/usr/bin/env python
"""Serving SLO at the websocket protocol boundary.

Launches the REAL drawing server (tornado + engine batcher) on the current
JAX device, drives N concurrent painter sessions over real websockets --
each session paints strokes back-to-back (send patch, await rendered RGBA,
move brush) like the live client -- and reports end-to-end per-stroke
round-trip p50/p99 plus aggregate strokes/sec.  This measures what a
painter feels (BASELINE's 30 ms budget at the protocol boundary,
reference forger/ui/util.py:107), not device-only render time.

Prints one JSON dict; bench.py folds the fields into the driver contract.
"""

import argparse
import asyncio
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, REPO)


def make_checkpoint(path: str, resolution: int):
    from brushstroke_engine_tpu.flagship import flagship_bundle
    from brushstroke_engine_tpu.utils.checkpoint import save_native
    import jax
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        save_native(path, flagship_bundle(img_resolution=resolution,
                                          num_bf16_res=6))


def launch_server(ckpt: str, port: int, batch_window_ms: int, log_path: str,
                  device_canvas: bool = True):
    env = dict(os.environ)
    cmd = [sys.executable, "-m", "brushstroke_engine_tpu.ui.server",
           "--gan_checkpoint", ckpt, "--port", str(port),
           "--disable_z_saving"]
    if device_canvas:
        cmd += ["--device_canvas"]
    if batch_window_ms:
        cmd += ["--batch_window_ms", str(batch_window_ms)]
    log = open(log_path, "w")
    proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            cwd=REPO, env=env)
    deadline = time.time() + 600
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"server died; see {log_path}")
        if os.path.exists(log_path) and \
                "Serving on" in open(log_path).read():
            return proc
        time.sleep(1.0)
    proc.kill()
    raise RuntimeError("server did not come up in 600s")


def _stroke(width: int, seed: int):
    rng = np.random.RandomState(seed)
    patch = np.zeros((width, width, 4), np.uint8)
    yy = (width / 2 + (width / 3) * np.sin(
        np.linspace(0, 2 * np.pi, width) + rng.rand() * 6)).astype(int)
    for x, y in enumerate(yy):
        lo, hi = max(0, y - 3), min(width, y + 3)
        patch[lo:hi, x, 3] = 255
    return patch


async def drive_session(port: int, sid: int, width: int, n_strokes: int,
                        warmup: int, results: dict):
    import tornado.websocket
    from brushstroke_engine_tpu.ui import protocol
    ws = await tornado.websocket.websocket_connect(
        f"ws://127.0.0.1:{port}/websocket/")
    for _ in range(2):   # modelinfo + brushinfo
        await ws.read_message()
    # Positional noise on (as the live client does when the server runs
    # with --device_canvas): routes strokes through the single-dispatch
    # device-resident canvas path.  Timing on: the server answers every
    # binary response with a JSON timing message decomposing queue wait /
    # render time / total server time, so the report can separate server
    # cost from wire (tunnel) cost.
    ws.write_message(json.dumps({"type": "set_option",
                                 "option": "positions", "value": True}))
    ws.write_message(json.dumps({"type": "set_option",
                                 "option": "timing", "value": True}))
    ws.write_message(json.dumps({"type": "new_canvas", "rows": 1024,
                                 "cols": 1024, "feature_blending": 2}))
    rng = np.random.RandomState(1000 + sid)
    times = []
    for i in range(n_strokes):
        patch = _stroke(width, sid * 10000 + i)
        x = int(rng.randint(0, 1024 - width))
        y = int(rng.randint(0, 1024 - width))
        t0 = time.perf_counter()
        ws.write_message(
            protocol.encode_render_request(patch, x, y, 0, 0, [], 0),
            binary=True)
        while True:
            raw = await ws.read_message()
            if isinstance(raw, (bytes, bytearray)):
                protocol.decode_render_response(raw)
                break
        rtt_ms = (time.perf_counter() - t0) * 1e3
        # The per-stroke timing message follows its binary response in
        # order on the same connection.
        timing = None
        raw = await ws.read_message()
        if isinstance(raw, str):
            msg = json.loads(raw)
            if msg.get("type") == "timing":
                timing = msg["data"]
        if i >= warmup:
            times.append((rtt_ms, timing))
    ws.close()
    results[sid] = times


async def run_sessions(port, sessions, width, n_strokes, warmup):
    results = {}
    t0 = time.perf_counter()
    await asyncio.gather(*[
        drive_session(port, s, width, n_strokes, warmup, results)
        for s in range(sessions)])
    wall = time.perf_counter() - t0
    return results, wall


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--strokes", type=int, default=136)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--port", type=int, default=8783)
    ap.add_argument("--batch_window_ms", type=int, default=6)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--no_device_canvas", action="store_true",
                    help="Serve WITHOUT --device_canvas so full-patch "
                         "strokes route through the cross-session "
                         "RenderBatcher: concurrent painters coalesce "
                         "into one dispatch per flush window (the right "
                         "trade on a high-dispatch-latency link).")
    ap.add_argument("--keep_server", action="store_true")
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="ws_slo_")
    ckpt = args.checkpoint
    if not ckpt:
        ckpt = os.path.join(workdir, "bundle.pkl")
        make_checkpoint(ckpt, args.resolution)
    log_path = os.path.join(workdir, "server.log")
    proc = launch_server(ckpt, args.port, args.batch_window_ms, log_path,
                         device_canvas=not args.no_device_canvas)
    try:
        results, wall = asyncio.run(run_sessions(
            args.port, args.sessions, args.resolution, args.strokes,
            args.warmup))
    finally:
        if not args.keep_server:
            proc.kill()
            proc.wait()

    samples = sum(results.values(), [])
    all_times = np.asarray([rtt for rtt, _ in samples])
    measured = args.sessions * (args.strokes - args.warmup)

    def pcts(arr, prefix):
        arr = np.asarray(arr)
        if arr.size == 0:
            return {}
        return {
            f"{prefix}_p50_ms": round(float(np.percentile(arr, 50)), 2),
            f"{prefix}_p90_ms": round(float(np.percentile(arr, 90)), 2),
            f"{prefix}_p99_ms": round(float(np.percentile(arr, 99)), 2),
        }

    out = {
        "sessions": args.sessions,
        "strokes_measured": int(all_times.size),
        "resolution": args.resolution,
        "batch_window_ms": args.batch_window_ms,
        **pcts(all_times, "ws"),
        "ws_max_ms": round(float(all_times.max()), 2),
        "aggregate_strokes_per_sec": round(measured / wall, 1),
        "server_log": log_path,
    }
    # Server-side decomposition (instrumented timing side-channel):
    # tunnel/wire cost per stroke = round trip minus total server time.
    timed = [(rtt, t) for rtt, t in samples if t is not None]
    if timed:
        out.update(pcts([t["server_ms"] for _, t in timed], "server"))
        out.update(pcts([t["render_ms"] for _, t in timed], "render"))
        out.update(pcts([t["queue_ms"] for _, t in timed], "queue"))
        out.update(pcts([rtt - t["server_ms"] for rtt, t in timed],
                        "wire"))
        out["timing_path"] = timed[0][1].get("path")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
