"""Serve a trained model with brush libraries and paint over the websocket.

The evidence driver for the brush-creation workflow (run_r5_brush_workflow.sh
stage 4; reference anchor neube_run.sh:86-103, which launches forger/ui/run.py
with 7 library specs): launches the REAL server process with the given
``--libraries`` spec, connects a websocket client, and for one brush from
EVERY library paints a multi-stroke squiggle with positional noise enabled,
compositing the returned patches client-side exactly the way the JS client
does.  Writes per-library stroke sheets, a fetched brush icon (exercising the
/brush/<lib>/<style>.jpg HTTP icon path), and a timings/brushinfo JSON.

Usage:
  python scripts/drive_brush_server.py --gan_checkpoint SNAP \
      --libraries "Seeds:rand9:default,Projected:disp:lib.pkl" \
      --out_dir docs/evidence/r5_brush_workflow/served --port 8741
"""

import argparse
import asyncio
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def stroke_patch(width: int, seed: int = 0) -> np.ndarray:
    """A thick wavy stroke mask in an RGBA uint8 patch (client-side the
    stroke geometry arrives as the user's painted alpha mask)."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0.15, 0.85, 64)
    amp = 0.18 + 0.1 * rng.rand()
    xs = t * width
    ys = (0.5 + amp * np.sin(t * (4 + 2 * rng.rand()) + rng.rand())) * width
    yy, xx = np.mgrid[0:width, 0:width]
    d = np.min((xx[..., None] - xs) ** 2 + (yy[..., None] - ys) ** 2, -1)
    mask = (d < (width * 0.09) ** 2).astype(np.uint8) * 255
    patch = np.zeros((width, width, 4), np.uint8)
    patch[..., 3] = mask
    patch[..., :3] = mask[..., None]
    return patch


async def paint_session(url, libraries, canvas_px, out_dir):
    import tornado.websocket
    from brushstroke_engine_tpu.ui import protocol

    ws = await tornado.websocket.websocket_connect(url)
    msg = json.loads(await ws.read_message())
    assert msg["type"] == "modelinfo", msg
    patch_width = int(msg["data"]["patch_width"])
    first_info = json.loads(await ws.read_message())
    assert first_info["type"] == "brushinfo", first_info

    # new_canvas rows/cols are PIXELS (reference protocol), rounded up to a
    # whole number of patches.
    side = int(np.ceil(canvas_px / patch_width)) * patch_width
    ws.write_message(json.dumps({"type": "new_canvas", "rows": side,
                                 "cols": side, "feature_blending": 1}))
    ws.write_message(json.dumps({"type": "set_option",
                                 "option": "positions", "value": 1}))

    async def read_binary():
        while True:
            raw = await ws.read_message()
            if raw is None:
                raise RuntimeError("socket closed")
            if not isinstance(raw, str):
                return raw

    report = {"patch_width": patch_width, "libraries": {}}
    for li, (lib_id, style_ids) in enumerate(libraries.items()):
        style_id = style_ids[0]
        ws.write_message(json.dumps({"type": "set_brush",
                                     "library_id": lib_id,
                                     "style_id": str(style_id)}))
        info = json.loads(await ws.read_message())
        assert info["type"] == "brushinfo", info
        assert info["data"]["style_id"] == str(style_id), (info, style_id)

        canvas = np.zeros((side, side, 4), np.float32)
        canvas[..., :3] = 1.0
        lat = []
        n_strokes = 6
        for si in range(n_strokes):
            x = int((si % 3) * patch_width * 0.8) + 4
            y = int((si // 3) * patch_width * 0.7) + li * 3 + 4
            t0 = time.time()
            ws.write_message(protocol.encode_render_request(
                stroke_patch(patch_width, seed=100 * li + si),
                x, y, 0, False, (), 0), binary=True)
            rtype, meta, rgba = protocol.decode_render_response(
                await read_binary())
            lat.append(1e3 * (time.time() - t0))
            assert rgba.shape[-1] == 4 and rgba.max() > 0
            # Client-side composite, same as the JS canvas putImage+alpha.
            px, py = meta["x"], meta["y"]
            h = min(rgba.shape[0], side - py)
            w = min(rgba.shape[1], side - px)
            a = rgba[:h, :w, 3:].astype(np.float32) / 255.0
            rgb = rgba[:h, :w, :3].astype(np.float32) / 255.0
            dst = canvas[py:py + h, px:px + w]
            dst[..., :3] = a * rgb + (1 - a) * dst[..., :3]
            dst[..., 3:] = np.maximum(dst[..., 3:], a)

        from PIL import Image
        sheet = (canvas[..., :3] * 255).astype(np.uint8)
        Image.fromarray(sheet).save(
            os.path.join(out_dir, f"strokes_{lib_id}.png"))
        report["libraries"][lib_id] = {
            "style_id": str(style_id),
            "n_styles": len(style_ids),
            "n_strokes": n_strokes,
            "stroke_ms_p50": float(np.percentile(lat, 50)),
            "stroke_ms_max": float(np.max(lat)),
            "brushinfo_colors": info["data"].get("colors", ""),
        }
        print(f"[{lib_id}] {len(style_ids)} styles; painted {n_strokes} "
              f"strokes with '{style_id}', p50 {np.percentile(lat, 50):.1f} ms")
    ws.close()
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gan_checkpoint", required=True)
    ap.add_argument("--encoder_checkpoint", default=None)
    ap.add_argument("--libraries", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--port", type=int, default=8741)
    ap.add_argument("--canvas_px", type=int, default=256)
    ap.add_argument("--startup_timeout", type=float, default=600.0)
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip server-side jit warmup (CPU smoke tests)")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)

    from brushstroke_engine_tpu.ui.server import (
        generate_z_file, parse_libraries)
    from brushstroke_engine_tpu.engine.library import BrushLibrary

    specs = parse_libraries(args.libraries)
    # Enumerate style ids from the library files exactly the way the server
    # does (default -> the checkpoint's saved-zs file); the ws protocol
    # addresses brushes by (library_id, style_id).
    libraries = {}
    for name, mode, path in specs:
        if path == "default":
            path = generate_z_file(args.gan_checkpoint)
        lib = BrushLibrary.from_file(path)
        ids = lib.get_style_ids()
        assert ids, f"library {name} ({path}) is empty"
        libraries[name] = ids

    cmd = [sys.executable, "-m", "brushstroke_engine_tpu.ui.server",
           "--gan_checkpoint", args.gan_checkpoint,
           "--libraries", args.libraries,
           "--port", str(args.port), "--disable_z_saving", "--device_canvas"]
    if args.encoder_checkpoint:
        cmd += ["--encoder_checkpoint", args.encoder_checkpoint]
    if args.no_warmup:
        cmd += ["--no_warmup"]
    log_path = os.path.join(args.out_dir, "server.log")
    with open(log_path, "w") as lf:
        proc = subprocess.Popen(cmd, stdout=lf, stderr=lf,
                                cwd=os.path.dirname(os.path.dirname(
                                    os.path.abspath(__file__))))
    try:
        deadline = time.time() + args.startup_timeout
        while time.time() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(f"server died; see {log_path}")
            with open(log_path) as f:
                if "Serving on" in f.read():
                    break
            time.sleep(2)
        else:
            raise RuntimeError("server startup timed out")

        url = f"ws://localhost:{args.port}/websocket/"
        report = asyncio.new_event_loop().run_until_complete(
            paint_session(url, libraries, args.canvas_px, args.out_dir))

        # Exercise the HTTP icon path for the first non-default library.
        import urllib.request
        for name, ids in libraries.items():
            icon_url = (f"http://localhost:{args.port}/brush/{name}/"
                        f"{ids[0]}.jpg")
            try:
                data = urllib.request.urlopen(icon_url, timeout=120).read()
                icon_file = os.path.join(args.out_dir, f"icon_{name}.jpg")
                with open(icon_file, "wb") as f:
                    f.write(data)
                report["libraries"][name]["icon_bytes"] = len(data)
            except Exception as e:  # icon path optional for rand libs
                report["libraries"][name]["icon_error"] = str(e)

        with open(os.path.join(args.out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
        print("served-strokes evidence written to", args.out_dir)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
