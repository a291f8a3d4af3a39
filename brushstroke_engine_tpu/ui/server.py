"""Interactive drawing server: HTTP + binary websocket on tornado.

Rebuild of the reference server (forger/ui/run.py:58-188 Flask+Tornado and
forger/ui/util.py:107-245 websocket handler) on tornado alone (the image has
no Flask).  Routes and the wire protocol match the reference:

  GET /                      drawing UI page (brush libraries in sidebar)
  GET /brush/<lib>/<name>.jpg brush icon JPEG
  WS  /websocket/            binary render requests + JSON control messages

JSON control messages: set_brush, save_brush, set_option(positions,
uvs_mapping, timing), set_render_mode, new_canvas (reference
util.py:216-242; `timing` is an additive opt-in: after each binary render
response the server emits a JSON timing message decomposing queue wait,
render time, and total server time for that stroke).
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import os
import random
import re
import time

import numpy as np
import tornado.ioloop
import tornado.web
import tornado.websocket

from brushstroke_engine_tpu.engine.brush import PaintEngineFactory
from brushstroke_engine_tpu.engine.canvas import PaintingHelper
from brushstroke_engine_tpu.engine.library import BrushLibrary
from brushstroke_engine_tpu.ui import protocol

logger = logging.getLogger(__name__)

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_STATIC_DIR = os.path.join(_PKG_DIR, "static")
_TEMPLATE_DIR = os.path.join(_PKG_DIR, "templates")


def generate_z_file(gan_checkpoint):
    if gan_checkpoint is None:
        return "/tmp/brushstroke_saved_zs.txt"
    return gan_checkpoint + ".saved_zs.txt"


class DrawingWebSocketHandler(tornado.websocket.WebSocketHandler):
    """Per-connection painting session (reference util.py:107-245)."""

    def initialize(self, paint_engine, style_seed, debug_dir,
                   saved_zs_filename=None, libraries=None,
                   use_device_canvas=False, batcher=None,
                   dev_batcher=None):
        self.helper = PaintingHelper(paint_engine, style_seed=style_seed,
                                     debug_dir=debug_dir)
        self.zs_file = saved_zs_filename
        self.libraries = libraries or {}
        self.use_positions = False
        self.uvs_mapping = False
        self.batcher = batcher
        # Cross-session device-canvas batcher (one dispatch per flush
        # window for ALL sessions' strokes); the session's canvas lives in
        # a slot of the batcher's stacked on-device pool.
        self.dev_batcher = dev_batcher
        self.dev_pool = None
        self.dev_slot = None
        # Device-resident feature canvas (engine/device_canvas.py): the
        # whole per-stroke step is one donated-state device dispatch
        # (~2.5 ms at 256px) instead of host feature traffic.  Requires a
        # real GAN engine; created lazily per new_canvas.
        self.use_device_canvas = use_device_canvas and \
            getattr(paint_engine, "gen_params", None) is not None
        self.dev_session = None
        self._canvas_shape = None
        self._blend_level = 0
        # Per-stroke server-side timing side-channel (opt-in via
        # set_option timing=1): after each binary render response the
        # server sends a JSON {"type": "timing"} message decomposing the
        # server cost (queue wait, render/device time, total) so SLO
        # probes can separate server cost from wire/tunnel cost.  The
        # binary wire format (reference forger/ui/util.py:26-105) is
        # untouched.
        self.collect_timing = False
        self._stroke_seq = 0

    def open(self):
        logger.debug("Socket opened.")
        self.write_message({
            "type": "modelinfo",
            "data": {"patch_width": self.helper.engine.patch_width}},
            binary=False)
        self.send_current_brush_info()

    def send_current_brush_info(self):
        opts = self.helper.brush_options
        colors = ""
        mapper = getattr(self.helper.engine, "uvs_mapper", None)
        if mapper is not None:
            try:
                colors = mapper.get_colors(opts)
            except Exception as e:
                logger.warning(f"color info failed: {e}")
        self.write_message({
            "type": "brushinfo",
            "data": {"style_id": str(opts.style_id),
                     "library_id": str(opts.library_id),
                     "colors": colors}},
            binary=False)

    def save_current_brush(self):
        opts = self.helper.brush_options
        if self.zs_file is None or opts.style_id is None \
                or opts.style_z is None:
            return
        try:
            with open(self.zs_file, "a") as f:
                f.write(("%d " % int(opts.style_id)) + " ".join(
                    "%f" % x for x in np.asarray(opts.style_z)[0].tolist())
                    + "\n")
        except (RuntimeError, ValueError):
            logger.warning("Failed to save z")

    async def on_message(self, message):
        # Coroutine handler: tornado serializes messages per connection
        # (response order within a session is preserved) while awaits —
        # the device-canvas download round-trip — yield the loop to OTHER
        # sessions, whose strokes then overlap on the wire instead of
        # queueing behind this one (reference serves one-request-at-a-time,
        # forger/ui/run.py handlers).
        try:
            if isinstance(message, bytes):
                await self._handle_binary_request(message)
            else:
                self._handle_json_request(message)
        except tornado.websocket.WebSocketClosedError:
            # Client went away while a stroke was in flight.
            logger.debug("client disconnected mid-stroke; dropping response")
        except Exception as e:
            logger.exception(f"Failed to handle incoming message: {e}")

    async def _handle_binary_request(self, raw):
        t_recv = time.perf_counter()
        meta, offset = protocol.decode_render_request_metadata(raw)
        patch_meta, img_stroke, img_canvas = \
            protocol.binary_to_image_patches(raw, offset)
        meta.update(patch_meta)
        await self._handle_image_request(meta, img_stroke, img_canvas,
                                         t_recv=t_recv)

    def _send_timing(self, t_recv, t_start, t_end, path):
        """JSON timing message for the stroke just answered (opt-in)."""
        if not self.collect_timing or t_recv is None:
            return
        seq = self._stroke_seq
        self._stroke_seq += 1
        now = time.perf_counter()
        try:
            self.write_message({"type": "timing", "data": {
                "seq": seq,
                "queue_ms": round((t_start - t_recv) * 1e3, 3),
                "render_ms": round((t_end - t_start) * 1e3, 3),
                "server_ms": round((now - t_recv) * 1e3, 3),
                "path": path}}, binary=False)
        except tornado.websocket.WebSocketClosedError:
            logger.debug("client disconnected before timing message")

    async def _handle_image_request(self, meta, bg_img, fg_img,
                                    t_recv=None):
        opts = self.helper.default_brush_options()
        for colorinfo in meta["colors"]:
            opts.set_color(int(colorinfo[0]), np.asarray(colorinfo[1:],
                                                         np.uint8))
        opts.debug = meta["debug"]
        if self.use_positions:
            opts.set_position(int(meta["x"]), int(meta["y"]))
        else:
            opts.position = None
        opts.enable_uvs_mapping = self.uvs_mapping

        pw = self.helper.engine.patch_width
        is_full_patch = bg_img.shape[0] == pw and bg_img.shape[1] == pw
        if self.use_device_canvas and self._blend_level > 0 and \
                self.use_positions and is_full_patch:
            if self.dev_batcher is not None and self._canvas_shape:
                # Pooled path: the stroke joins the next cross-session
                # flush; N concurrent painters cost ONE device dispatch
                # per window instead of N serialized round trips
                # (round-4 8-session ws_p50 was 179 ms for this reason).
                if self.dev_slot is None:
                    self.dev_pool = self.dev_batcher.pool_for(
                        self._canvas_shape, self._blend_level,
                        int(meta.get("crop_margin", 0)))
                    self.dev_slot = self.dev_batcher.acquire_slot(
                        self.dev_pool)
                extra = meta["extra_data"] or 0

                def respond(img, meta_out, _extra=extra, _t_recv=t_recv):
                    self.write_message(
                        protocol.int32_to_binary(_extra)
                        + protocol.image_patch_to_binary(
                            img, meta_out["x"], meta_out["y"]), binary=True)
                    t0 = meta_out.get("_t_start")
                    t1 = meta_out.get("_t_end")
                    if t0 is not None and t1 is not None:
                        self._send_timing(_t_recv, t0, t1, "device_batched")

                # Raw wire alpha, uint8: the float inversion
                # (prepare_geom_input) runs on device so the request
                # crosses the host->device link at 1 byte/px, not 4.
                geom = np.ascontiguousarray(bg_img[:, :, -1]).ravel()
                self.dev_batcher.submit(
                    self, self.dev_pool, self.dev_slot, geom, opts,
                    int(meta["x"]), int(meta["y"]), respond)
                return
            from brushstroke_engine_tpu.engine.device_canvas import (
                DevicePaintSession,
            )
            if self.dev_session is None and self._canvas_shape:
                self.dev_session = DevicePaintSession(
                    self.helper.engine, self._canvas_shape[0],
                    self._canvas_shape[1],
                    feature_blending_level=self._blend_level,
                    crop_margin=int(meta.get("crop_margin", 0)))
            if self.dev_session is not None:
                # Run the whole stroke (upload + dispatch + download) in an
                # executor thread: the loop keeps serving other sessions
                # during this stroke's host<->device round trips, so
                # concurrent painters overlap on the wire instead of
                # queueing.  Safe because tornado serializes messages per
                # connection (each session's strokes stay ordered on its
                # own canvas) and JAX dispatch is thread-safe.
                def timed_render(_bg=bg_img, _o=opts, _x=int(meta["x"]),
                                 _y=int(meta["y"])):
                    t0 = time.perf_counter()
                    out = self.dev_session.render_stroke(_bg, _o, _x, _y)
                    return out, t0, time.perf_counter()

                (res_img, meta_out), t0, t1 = \
                    await tornado.ioloop.IOLoop.current() \
                    .run_in_executor(None, timed_render)
                head = protocol.int32_to_binary(meta["extra_data"] or 0)
                self.write_message(head + protocol.image_patch_to_binary(
                    res_img, meta_out["x"], meta_out["y"]), binary=True)
                self._send_timing(t_recv, t0, t1, "device_canvas")
                return

        if self.batcher is not None and is_full_patch \
                and not meta["debug"] and not self.uvs_mapping \
                and hasattr(self.helper.engine, "_render_stroke_jax") \
                and not opts.custom_args.get("noise_buffers"):
            extra = meta["extra_data"] or 0

            def respond(img, meta_out, _extra=extra, _t_recv=t_recv):
                self.write_message(
                    protocol.int32_to_binary(_extra)
                    + protocol.image_patch_to_binary(
                        img, meta_out["x"], meta_out["y"]), binary=True)
                # The batcher stamps the shared dispatch window into
                # meta_out; queue time = wait for the flush window.
                t0 = meta_out.get("_t_start")
                t1 = meta_out.get("_t_end")
                if t0 is not None and t1 is not None:
                    self._send_timing(_t_recv, t0, t1, "batched")

            self.batcher.submit(self.helper, opts, bg_img, meta, respond)
            return

        t0 = time.perf_counter()
        res_img, debug_img, meta_out = self.helper.render_stroke(
            bg_img, fg_img, opts, meta)
        t1 = time.perf_counter()
        head = protocol.int32_to_binary(meta["extra_data"] or 0)
        self.write_message(head + protocol.image_patch_to_binary(
            res_img, meta_out["x"], meta_out["y"]), binary=True)
        self._send_timing(t_recv, t0, t1, "helper")
        if debug_img is not None:
            self.write_message(
                protocol.int32_to_binary(1)
                + protocol.image_patch_to_binary(debug_img, 0, 0),
                binary=True)

    def _handle_json_request(self, raw):
        msg = json.loads(raw)
        mtype = msg.get("type")
        if mtype == "set_brush":
            if msg.get("style_id") and msg.get("library_id"):
                lib_id = msg.get("library_id")
                style_id = msg.get("style_id")
                style_id2 = msg.get("style_id2")
                if lib_id in self.libraries and \
                        style_id in self.libraries[lib_id].get_style_ids():
                    lib = self.libraries[lib_id]
                    if style_id2 and style_id2 in lib.get_style_ids():
                        lib.set_interpolated_style(
                            style_id, style_id2,
                            float(msg.get("alpha", 0.5)),
                            self.helper.brush_options)
                    else:
                        lib.set_style(style_id, self.helper.brush_options)
                    self.helper.brush_options.library_id = lib_id
            else:
                self.helper.set_new_brush(msg.get("seed"))
            self.send_current_brush_info()
        elif mtype == "save_brush":
            self.save_current_brush()
        elif mtype == "set_option":
            if msg.get("option") == "positions":
                self.use_positions = bool(msg.get("value"))
            elif msg.get("option") == "uvs_mapping":
                self.uvs_mapping = bool(msg.get("value"))
            elif msg.get("option") == "timing":
                self.collect_timing = bool(msg.get("value"))
        elif mtype == "set_render_mode":
            self.helper.set_render_mode(msg.get("mode"))
        elif mtype == "new_canvas":
            self.helper.make_new_canvas(
                int(msg.get("rows")), int(msg.get("cols")),
                feature_blending=int(msg.get("feature_blending", 0)))
            self._canvas_shape = (int(msg.get("rows")),
                                  int(msg.get("cols")))
            self._blend_level = int(msg.get("feature_blending", 0))
            self.dev_session = None
            self._release_dev_slot()
        else:
            logger.warning(f"Unknown json message type {mtype}")

    def _release_dev_slot(self):
        if self.dev_slot is not None:
            self.dev_batcher.release_slot(self.dev_pool, self.dev_slot)
            self.dev_pool = None
            self.dev_slot = None

    def on_close(self):
        self._release_dev_slot()
        logger.info("Socket closed.")


class IndexHandler(tornado.web.RequestHandler):
    def initialize(self, engine, libraries, library_specs):
        self.engine = engine
        self.libraries = libraries
        self.library_specs = library_specs

    def get(self):
        library_infos = {}
        for spec_name, spec_mode, _path in self.library_specs:
            lib = self.libraries[spec_name]
            brushes = list(lib.get_style_ids())
            m = re.match(r"rand(\d+)", spec_mode)
            if m is not None:
                random.shuffle(brushes)
                brushes = brushes[:int(m.group(1))]
            library_infos[spec_name] = {"brushes": brushes}
        self.render(os.path.join(_TEMPLATE_DIR, "home.html"),
                    subtitle=self.engine.summary(),
                    canvas_width=int(self.get_argument("canvas", 2000)),
                    demo=(self.get_argument("demo", None) is not None),
                    library_infos=library_infos)


class BrushIconHandler(tornado.web.RequestHandler):
    def initialize(self, libraries):
        self.libraries = libraries

    def get(self, library_name, brush_name):
        import PIL.Image
        if library_name in self.libraries:
            image = self.libraries[library_name].get_style_icon(brush_name)
        else:
            image = None
        if image is None:
            image = np.zeros((128, 128, 3), dtype=np.uint8)
        img = PIL.Image.fromarray(image)
        if img.mode == "RGBA":
            img = img.convert("RGB")
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        self.set_header("Content-Type", "image/jpeg")
        self.write(buf.getvalue())


def create_server(encoder_checkpoint, gan_checkpoint, debug_dir=None,
                  style_seed=None, enable_z_saving=False,
                  library_specs=None, use_device_canvas=False,
                  batch_window_ms: float = 0.0, paint_engine=None):
    engine = paint_engine if paint_engine is not None else \
        PaintEngineFactory.create(gan_checkpoint,
                                  encoder_checkpoint=encoder_checkpoint)
    z_file = generate_z_file(gan_checkpoint)
    library_specs = library_specs or []

    libraries = {}
    z_dim = getattr(getattr(engine, "gen_cfg", None), "z_dim", 64)
    for spec_name, _spec_mode, spec_path in library_specs:
        if spec_path == "default":
            spec_path = z_file
        lib = BrushLibrary.from_file(spec_path, z_dim=z_dim)
        mapper = getattr(engine, "uvs_mapper", None)
        if mapper is not None:
            lib.enable_dynamic_icons(mapper)
        libraries[spec_name] = lib

    batcher = None
    dev_batcher = None
    if batch_window_ms > 0 and hasattr(engine, "_render_stroke_jax"):
        batcher = RenderBatcher(engine, batch_window_ms)
        if use_device_canvas:
            dev_batcher = DeviceRenderBatcher(engine, batch_window_ms)

    app = tornado.web.Application([
        (r"/websocket/", DrawingWebSocketHandler,
         dict(paint_engine=engine, style_seed=style_seed,
              debug_dir=debug_dir,
              saved_zs_filename=(z_file if enable_z_saving else None),
              libraries=libraries,
              use_device_canvas=use_device_canvas,
              batcher=batcher, dev_batcher=dev_batcher)),
        (r"/brush/([^/]+)/([^/]+)\.jpg", BrushIconHandler,
         dict(libraries=libraries)),
        (r"/static/(.*)", tornado.web.StaticFileHandler,
         dict(path=_STATIC_DIR)),
        (r"/", IndexHandler,
         dict(engine=engine, libraries=libraries,
              library_specs=library_specs)),
    ])
    app.paint_engine = engine
    app.dev_batcher = dev_batcher
    return app


class RenderBatcher:
    """Cross-session micro-batching: coalesce render requests from all
    connected drawing sessions into ONE device dispatch per flush window.

    Production-serving feature beyond the reference (whose engine renders
    one request at a time): with N concurrent painters, batched synthesis
    amortizes dispatch latency and fills the chip (throughput scales with
    batch until saturation -- see docs/ARCHITECTURE.md).  Requests that
    cannot batch (debug sheets, stored-noise brushes, UVS-mapped styles,
    partial patches) keep the per-request path.
    """

    BUCKETS = (1, 2, 4, 8, 16, 32)

    def __init__(self, engine, window_ms: float):
        self.engine = engine
        self.window_ms = window_ms
        self.items = []
        self._cb = None

    def start(self):
        import tornado.ioloop
        if self._cb is None:
            self._cb = tornado.ioloop.PeriodicCallback(self.flush,
                                                       self.window_ms)
            self._cb.start()

    def submit(self, helper, opts, stroke_patch, meta, respond):
        """Queue one request; ``respond(img, out_meta)`` is called from the
        flush with the rendered uint8 patch.

        ``prepare_render`` (which gathers the feature canvas) is deferred to
        flush time, and each flush takes at most ONE request per helper, so
        overlapping strokes from the same session blend against the features
        their predecessors wrote back -- identical to the serial path."""
        self.items.append({"helper": helper, "opts": opts,
                           "patch": stroke_patch, "meta": meta,
                           "respond": respond})
        self.start()

    @staticmethod
    def _group_key(item):
        opts = item["opts"]
        rf = item["prep"]["generator_kwargs"].get("return_features", ())
        return (rf, opts.style_ws is not None,
                opts.get_position() is not None)

    def _respond_single(self, it):
        """Per-request fallback path (also the batch-failure recovery)."""
        try:
            t0 = time.perf_counter()
            img, _debug, out_meta = it["helper"].render_stroke(
                it["patch"], None, it["opts"], it["meta"])
            out_meta["_t_start"] = t0
            out_meta["_t_end"] = time.perf_counter()
            it["respond"](img, out_meta)
        except Exception:
            logger.exception("RenderBatcher: per-request fallback failed; "
                             "dropping one response")

    def flush(self):
        import numpy as np
        import jax.numpy as jnp

        if not self.items:
            return
        # Take at most one request per helper this flush; later requests
        # from the same session stay queued until the next window so they
        # see this one's feature write-back (sequential blending).
        taken, deferred, seen = [], [], set()
        for it in self.items:
            key = id(it["helper"])
            (deferred if key in seen else taken).append(it)
            seen.add(key)
        self.items = deferred

        items = []
        for it in taken:
            try:
                it["prep"] = it["helper"].prepare_render(it["patch"],
                                                         it["meta"])
                items.append(it)
            except Exception:
                logger.exception("RenderBatcher: prepare_render failed; "
                                 "falling back to the per-request path")
                self._respond_single(it)
        groups = {}
        for it in items:
            groups.setdefault(self._group_key(it), []).append(it)

        for (rf, _use_ws, _has_pos), group in groups.items():
            n = len(group)
            logger.debug(f"RenderBatcher: {n} request(s) in one dispatch "
                         f"(rf={rf})")
            bucket = next(b for b in self.BUCKETS if b >= n) \
                if n <= self.BUCKETS[-1] else n
            pad = group + [group[-1]] * (bucket - n)

            geoms = np.concatenate([it["prep"]["geom"] for it in pad])
            blended = None
            if rf:
                res = rf[0]
                rows_f, rows_a = [], []
                blend_r = None
                ch = self.engine.gen_cfg.synthesis.channels(res)
                for it in pad:
                    bf = it["prep"]["generator_kwargs"]["blended_features"]
                    if res in bf:
                        f, a = bf[res]
                        blend_r = f.shape[1]
                    rows_f.append(bf.get(res))
                    rows_a.append(None if res not in bf else bf[res][1])
                if blend_r is None:
                    blend_r = res
                zf = jnp.zeros((1, blend_r, blend_r, ch), jnp.float32)
                za = jnp.zeros((1, blend_r, blend_r, 1), jnp.float32)
                feats = jnp.concatenate(
                    [r[0] if r is not None else zf for r in rows_f])
                alphas = jnp.concatenate(
                    [a if a is not None else za for a in rows_a])
                blended = {res: (feats, alphas)}

            try:
                t0 = time.perf_counter()
                out = self.engine.render_batch(
                    geoms, [it["opts"] for it in pad],
                    blended_features=blended, return_features=rf)
                rgba = np.asarray(out["rgba"])
            except Exception:
                logger.exception("RenderBatcher: batched dispatch failed; "
                                 "falling back to the per-request path")
                for it in group:
                    self._respond_single(it)
                continue
            for i, it in enumerate(group):
                try:
                    raw_row = {f"features{r}": out[f"features{r}"][i:i + 1]
                               for r in rf}
                    img, out_meta = it["helper"].finish_render(
                        it["prep"], rgba[i], raw_row)
                    # Timing side-channel: the shared dispatch window.
                    out_meta["_t_start"] = t0
                    out_meta["_t_end"] = time.perf_counter()
                    it["respond"](img, out_meta)
                except Exception:
                    logger.exception("RenderBatcher: finishing one request "
                                     "failed; its response is dropped")


class DeviceRenderBatcher:
    """Cross-session micro-batching for DEVICE-CANVAS strokes.

    The round-4 architecture rendered one session per dispatch on this path
    (each ~1 host<->device round trip, serialized by chip contention), so
    contended latency grew linearly with sessions: 8-session ws_p50 179 ms
    vs 49 ms single-session.  This batcher coalesces all sessions' pending
    strokes each flush window into ONE pooled dispatch
    (engine/device_canvas.py:render_strokes_pool): the per-session canvases
    are slots of a stacked on-device PoolState, the generator forward is
    batched on the MXU, and the whole window costs one upload + one
    dispatch + one download.

    Ordering: at most one request per session per flush (later strokes stay
    queued so they blend against their predecessor's feature write-back),
    and all device work runs on a single dedicated worker thread, so each
    session's responses arrive in stroke order.
    """

    def __init__(self, engine, window_ms: float, pool_capacity: int = 8,
                 pipeline_depth: int = 2):
        import concurrent.futures
        import threading
        self.engine = engine
        self.window_ms = window_ms
        self.pool_capacity = pool_capacity
        self.pools = {}
        self.items = []
        self._cb = None
        # ONE worker: flush jobs execute FIFO, which both serializes the
        # donated pool-state transitions and preserves per-session response
        # order across flush windows.
        self._worker = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="devbatch")
        # Downloads run on their own FIFO worker so job k's response
        # readback overlaps job k+1's upload + dispatch on the (full
        # duplex) host<->device link; per-session response order is still
        # total because each session has at most one stroke per job and
        # both executors are single-worker FIFO.
        self._fetcher = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="devfetch")
        # At most TWO jobs between dispatch and response delivery.  Without
        # a gate the flush tick submits a job for whatever trickled in
        # since the last tick, and under closed-loop painters the system
        # desynchronizes into a round-robin of single-stroke jobs: measured
        # 284/293 flushes at batch size 1, 8-session p50 ~480 ms (each
        # stroke queues behind 7 others' serialized renders).  Gating
        # flushes on job completion makes strokes ACCUMULATE during the
        # in-flight render, so the next flush takes all sessions' strokes
        # in one pooled dispatch and the loop self-synchronizes into full
        # batches; allowing a depth of 2 keeps the link busy in both
        # directions at once.
        self.pipeline_depth = pipeline_depth
        self._inflight_jobs = 0
        # Guards pool.state transitions that happen on the IOLoop thread
        # (slot acquire/release/reset) against the worker's render dispatch.
        self._state_lock = threading.Lock()

    def pool_for(self, canvas_shape, level, crop_margin):
        from brushstroke_engine_tpu.engine.device_canvas import (
            DeviceCanvasPool,
        )
        key = (tuple(canvas_shape), int(level), int(crop_margin))
        if key not in self.pools:
            self.pools[key] = DeviceCanvasPool(
                self.engine, canvas_shape[0], canvas_shape[1],
                feature_blending_level=level, crop_margin=crop_margin,
                capacity=self.pool_capacity)
        return self.pools[key]

    def acquire_slot(self, pool):
        with self._state_lock:
            return pool.acquire()

    def release_slot(self, pool, slot):
        with self._state_lock:
            pool.release(slot)

    def start(self):
        import tornado.ioloop
        if self._cb is None:
            self._cb = tornado.ioloop.PeriodicCallback(self.flush,
                                                       self.window_ms)
            self._cb.start()

    def submit(self, handler, pool, slot, geom, opts, x, y, respond):
        self.items.append({"handler": handler, "pool": pool, "slot": slot,
                           "geom": geom, "opts": opts, "x": x, "y": y,
                           "respond": respond})
        self.start()

    def flush(self):
        import tornado.ioloop
        if not self.items or self._inflight_jobs >= self.pipeline_depth:
            return
        # At most one request per session this flush; the rest stay queued
        # (in order) so they see this one's feature write-back.
        taken, deferred, seen = [], [], set()
        for it in self.items:
            key = id(it["handler"])
            (deferred if key in seen else taken).append(it)
            seen.add(key)
        self.items = deferred

        groups = {}
        for it in taken:
            key = (id(it["pool"]), it["opts"].style_ws is not None)
            groups.setdefault(key, []).append(it)
        loop = tornado.ioloop.IOLoop.current()
        self._inflight_jobs += 1
        self._worker.submit(self._run_groups, list(groups.values()), loop)

    def _job_done(self):
        # IOLoop thread: re-arm and drain immediately — strokes that
        # arrived during the render shouldn't also wait out a tick.
        self._inflight_jobs -= 1
        self.flush()

    def _run_groups(self, groups, loop):
        # Dispatch every group's render, then hand the downloads to the
        # fetcher worker: the device computes (and this worker can upload
        # the NEXT job) while response bytes stream back.
        dispatched = []
        for group in groups:
            pool = group[0]["pool"]
            t0 = time.perf_counter()
            try:
                with self._state_lock:
                    rgba, metas = pool.render_batch(
                        [{"slot": it["slot"], "geom": it["geom"],
                          "x": it["x"], "y": it["y"], "opts": it["opts"]}
                         for it in group])
            except Exception:
                logger.exception(
                    "DeviceRenderBatcher: batched dispatch failed; "
                    f"dropping {len(group)} response(s)")
                continue
            dispatched.append((pool, group, rgba, metas, t0))
        self._fetcher.submit(self._fetch_job, dispatched, loop)

    def _fetch_job(self, dispatched, loop):
        try:
            for pool, group, rgba, metas, t0 in dispatched:
                try:
                    # ONE download for the whole batch.
                    imgs = np.asarray(rgba)
                except Exception:
                    logger.exception(
                        "DeviceRenderBatcher: batched readback failed; "
                        f"dropping {len(group)} response(s)")
                    continue
                t1 = time.perf_counter()
                m = pool.crop_margin
                for i, it in enumerate(group):
                    img = imgs[i]
                    if m > 0:
                        img = img[m:-m, m:-m]
                    meta = dict(metas[i])
                    meta["_t_start"] = t0
                    meta["_t_end"] = t1
                    loop.add_callback(it["respond"],
                                      np.ascontiguousarray(img), meta)
        finally:
            loop.add_callback(self._job_done)

    def warmup(self, rows, cols, level, buckets=(1, 2, 4, 8),
               crop_margin=0):
        """Pre-compile the pooled render for the given canvas config and
        batch buckets (scratch-slot rows; no real canvas is touched)."""
        from brushstroke_engine_tpu.engine.brush import GanBrushOptions
        from brushstroke_engine_tpu.engine.canvas import PaintingHelper
        pool = self.pool_for((rows, cols), level, crop_margin)
        eng = self.engine
        patch = PaintingHelper.test_stroke(eng.patch_width)
        geom = np.ascontiguousarray(patch[:, :, -1]).ravel()
        for bucket in buckets:
            reqs = []
            for i in range(bucket):
                o = GanBrushOptions()
                o.set_style(eng.random_style(i), i)
                reqs.append({"slot": pool.scratch_slot, "geom": geom,
                             "x": 0, "y": 0, "opts": o})
            rgba, _ = pool.render_batch(reqs)
            np.asarray(rgba)


def warmup_engine(engine, blend_levels=(0, 2), batch_buckets=()):
    """Pre-compile the render programs the first strokes will hit, so the
    first user stroke doesn't pay the XLA compile (~seconds).

    ``batch_buckets``: additionally warm the cross-session RenderBatcher's
    batch shapes (power-of-two bucket sizes) for the common group
    (positions on, blended features present at the highest blend level).
    """
    if not hasattr(engine, "_render_stroke_jax"):
        return
    import time

    import jax.numpy as jnp

    from brushstroke_engine_tpu.engine.brush import GanBrushOptions
    from brushstroke_engine_tpu.engine.canvas import PaintingHelper

    t0 = time.time()
    patch = PaintingHelper.test_stroke(engine.patch_width)
    for lvl in blend_levels:
        helper = PaintingHelper(engine, style_seed=0)
        helper.make_new_canvas(engine.patch_width * 2,
                               engine.patch_width * 2,
                               feature_blending=lvl)
        opts = helper.default_brush_options()
        opts.set_position(0, 0)
        # Twice: the first render compiles the fresh-canvas program, the
        # second the stored-features blending variant.
        helper.render_stroke(patch, None, opts, meta={"x": 0, "y": 0})
        helper.render_stroke(patch, None, opts, meta={"x": 0, "y": 0})
    # The brush-info color swatch (sent at every client connect) renders
    # through its own positions-less variant; warm it too.
    mapper = getattr(engine, "uvs_mapper", None)
    if mapper is not None:
        mapper.get_colors(PaintingHelper(engine, style_seed=0)
                          .default_brush_options())

    # Batch-bucket shapes for the cross-session RenderBatcher.
    if batch_buckets and blend_levels:
        lvl = max(blend_levels)
        pw = engine.patch_width
        res = pw // 2 ** (lvl - 1) if lvl > 0 else None
        geom1 = engine.prepare_geom_input(patch).reshape(1, pw, pw, 1)
        ch = engine.gen_cfg.synthesis.channels(res) if res else 0
        for bucket in batch_buckets:
            geoms = np.concatenate([geom1] * bucket)
            opts_rows = []
            for i in range(bucket):
                o = GanBrushOptions()
                o.set_style(engine.random_style(i), i)
                o.set_position(0, 0)
                opts_rows.append(o)
            blended = None
            rf = ()
            if res:
                blended = {res: (jnp.zeros((bucket, res, res, ch)),
                                 jnp.zeros((bucket, res, res, 1)))}
                rf = (res,)
            engine.render_batch(geoms, opts_rows, blended_features=blended,
                                return_features=rf)
    logger.info(f"Warmed render programs (blend levels {blend_levels}, "
                f"buckets {tuple(batch_buckets)}) "
                f"in {time.time() - t0:.1f}s")


def parse_libraries(libraries_arg):
    """'name:mode:path,...' spec parser (reference run.py:145-156)."""
    libraries = []
    if libraries_arg:
        libraries = [x.split(":") for x in libraries_arg.split(",")]
    for i in range(len(libraries)):
        if len(libraries[i]) == 1:
            libraries[i] = [os.path.basename(libraries[i][0]), "disp",
                            libraries[i][0]]
        elif len(libraries[i]) == 2:
            libraries[i] = [libraries[i][0], "disp", libraries[i][1]]
        assert len(libraries[i]) == 3, \
            f"Malformed library spec {libraries[i]}"
        assert libraries[i][1] in ("disp", "random") or \
            re.match(r"rand\d+", libraries[i][1])
    return libraries


def run_main(argv=None):
    ap = argparse.ArgumentParser(description="Brushstroke engine UI server.")
    ap.add_argument("--gan_checkpoint", type=str, default=None)
    ap.add_argument("--encoder_checkpoint", type=str, default=None)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--debug_dir", type=str, default=None)
    ap.add_argument("--style_seed", type=int, default=None)
    ap.add_argument("--disable_z_saving", action="store_true")
    ap.add_argument("--libraries", type=str, default="Default:random:default")
    ap.add_argument("--device_canvas", action="store_true",
                    help="Keep the per-session feature canvas resident on "
                         "device (one dispatch per stroke, ~2.5 ms at "
                         "256px); requires positional noise enabled in "
                         "the client.")
    ap.add_argument("--batch_window_ms", type=float, default=0.0,
                    help="Cross-session micro-batching: coalesce render "
                         "requests from all sessions for this many ms and "
                         "render them as one device dispatch (0 = off). "
                         "Recommended 5-15 ms for multi-user serving.")
    ap.add_argument("--serve_devices", type=int, default=0,
                    help="Shard cross-session batched renders over this "
                         "many local devices (multi-chip serving; 0 = "
                         "single device). Use with --batch_window_ms.")
    ap.add_argument("--no_warmup", action="store_true",
                    help="Skip pre-compiling the render programs at "
                         "startup (first stroke then pays the compile).")
    ap.add_argument("--precision", choices=["fast", "strict"],
                    default="fast",
                    help="Serving conv/matmul precision. 'fast' (default) "
                         "uses native TPU passes (bf16-grade on f32 "
                         "layers); 'strict' forces full-f32 6-pass convs "
                         "for golden-parity debugging -- several times "
                         "slower and never needed to serve.")
    ap.add_argument("--int8", choices=["off", "static"], default="off",
                    help="'static' enables static-calibration int8 PTQ "
                         "for the render stack: one calibration pass at "
                         "startup, then synthesis convs run on the "
                         "double-rate int8 MXU with baked scales "
                         "(~1.29x measured on the 256px synthesis block; "
                         "PSNR>25 dB vs bf16, tests/test_quant.py).")
    ap.add_argument("--log_level", type=int, default=logging.INFO)
    args = ap.parse_args(argv)
    logging.basicConfig(level=args.log_level)

    from brushstroke_engine_tpu.ops.precision import set_precision_mode
    set_precision_mode(args.precision)

    from brushstroke_engine_tpu.utils.compile_cache import \
        enable_persistent_cache
    cache_dir = enable_persistent_cache()
    if cache_dir:
        logger.info(f"Persistent XLA compile cache at {cache_dir}")

    server = create_server(
        encoder_checkpoint=args.encoder_checkpoint,
        gan_checkpoint=args.gan_checkpoint,
        debug_dir=args.debug_dir,
        style_seed=args.style_seed,
        enable_z_saving=not args.disable_z_saving,
        library_specs=parse_libraries(args.libraries),
        use_device_canvas=args.device_canvas,
        batch_window_ms=args.batch_window_ms)
    if args.serve_devices > 1:
        import jax
        from jax.sharding import Mesh
        devices = jax.devices()[:args.serve_devices]
        assert len(devices) == args.serve_devices, \
            f"need {args.serve_devices} devices, have {len(jax.devices())}"
        server.paint_engine.set_serving_mesh(
            Mesh(np.asarray(devices), ("data",)))
        logger.info(f"Sharding batched renders over {len(devices)} devices")
    if args.int8 == "static" and hasattr(server.paint_engine,
                                         "enable_int8_serving"):
        n = len(server.paint_engine.enable_int8_serving())
        logger.info(f"Static-int8 serving: calibrated {n} conv sites")
    if not args.no_warmup:
        # Bucket 1 matters: a single painter with batching on renders
        # through render_batch (a different program than the per-request
        # path), so it must be warmed too or the first stroke pays the
        # full XLA compile.
        warmup_engine(server.paint_engine,
                      batch_buckets=(1, 2, 4, 8) if args.batch_window_ms > 0
                      else ())
        if server.dev_batcher is not None:
            # Pooled device-canvas programs are shaped by the canvas size;
            # warm the client default (home.html canvas=2000, blending 2).
            server.dev_batcher.warmup(2000, 2000, level=2)
    server.listen(args.port)
    logger.info(f"Serving on http://localhost:{args.port}")
    tornado.ioloop.IOLoop.instance().start()


if __name__ == "__main__":
    run_main()
