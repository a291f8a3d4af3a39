"""Server tests: protocol round trip + live tornado server with a websocket
client driving the mock and GAN engines."""

import json
import os
import pickle

# Non-coroutine test bodies (plain self.fetch) run under tornado's
# run_sync with this timeout (default 5 s) — too short for a first GAN
# render that pays the XLA compile.  Must be set before tornado.testing
# reads it.
os.environ.setdefault("ASYNC_TEST_TIMEOUT", "300")

import numpy as np
import pytest

import tornado.gen
import tornado.testing
import tornado.websocket

from brushstroke_engine_tpu.ui import protocol
from brushstroke_engine_tpu.ui.server import create_server, parse_libraries
from brushstroke_engine_tpu.utils.checkpoint import save_native
from tests.helpers import small_bundle


class TestProtocol:
    def test_request_roundtrip(self):
        rng = np.random.RandomState(0)
        patch = (rng.rand(16, 16, 4) * 255).astype(np.uint8)
        raw = protocol.encode_render_request(
            patch, x=5, y=7, crop_margin=2, debug=True,
            colors=[(0, 255, 0, 0), (1, 0, 255, 0)], extra_data=3)
        meta, offset = protocol.decode_render_request_metadata(raw)
        assert meta["debug"] is True
        assert meta["extra_data"] == 3
        assert len(meta["colors"]) == 2
        patch_meta, img, _ = protocol.binary_to_image_patches(raw, offset)
        assert patch_meta == {"width": 16, "height": 16, "x": 5, "y": 7,
                              "crop_margin": 2}
        np.testing.assert_array_equal(img, patch)

    def test_response_roundtrip(self):
        rng = np.random.RandomState(1)
        img = (rng.rand(8, 8, 4) * 255).astype(np.uint8)
        raw = protocol.int32_to_binary(0) + \
            protocol.image_patch_to_binary(img, 3, 4)
        rtype, meta, decoded = protocol.decode_render_response(raw)
        assert rtype == 0
        assert meta == {"x": 3, "y": 4}
        np.testing.assert_array_equal(decoded, img)

    def test_parse_libraries(self):
        specs = parse_libraries("A:rand5:/tmp/a.pkl,B:disp:/tmp/b.txt")
        assert specs == [["A", "rand5", "/tmp/a.pkl"],
                         ["B", "disp", "/tmp/b.txt"]]
        specs = parse_libraries("/tmp/c.pkl")
        assert specs == [["c.pkl", "disp", "/tmp/c.pkl"]]


class ServerTestBase(tornado.testing.AsyncHTTPTestCase):
    gan_checkpoint = None

    def get_app(self):
        seeds = os.path.join(self.tmpdir, "seeds.txt")
        with open(seeds, "w") as f:
            f.write("1\n2\n3\n")
        return create_server(
            encoder_checkpoint=None,
            gan_checkpoint=self.gan_checkpoint,
            library_specs=[["Lib", "disp", seeds]])

    def setUp(self):
        import tempfile
        self.tmpdir = tempfile.mkdtemp()
        self._prepare()
        super().setUp()

    def _prepare(self):
        pass


class TestMockServer(ServerTestBase):
    def test_index_page(self):
        resp = self.fetch("/")
        assert resp.code == 200
        body = resp.body.decode()
        assert "strokeCanvas" in body
        assert "Lib" in body

    def test_brush_icon_unknown_library(self):
        resp = self.fetch("/brush/nope/1.jpg")
        assert resp.code == 200
        assert resp.headers["Content-Type"] == "image/jpeg"

    def test_static_js(self):
        resp = self.fetch("/static/app.js")
        assert resp.code == 200

    def test_js_element_ids_exist_in_template(self):
        """Every DOM id app.js references must exist in home.html (no JS
        runtime in this environment, so cross-check statically)."""
        import re
        from brushstroke_engine_tpu import ui as ui_pkg
        base = os.path.dirname(ui_pkg.__file__)
        js = open(os.path.join(base, "static", "app.js")).read()
        html = open(os.path.join(base, "templates", "home.html")).read()
        ids = set(re.findall(r"getElementById\([\"']([^\"']+)[\"']\)", js))
        # app.js aliases getElementById as $(...)
        ids |= set(re.findall(r"\$\([\"']([^\"']+)[\"']\)", js))
        assert ids, "no getElementById calls found?"
        missing = [i for i in ids if f'id="{i}"' not in html]
        assert not missing, missing
        # Balanced braces/parens as a cheap syntax smoke.
        for o, c in ("{}", "()", "[]"):
            assert js.count(o) == js.count(c), (o, js.count(o), js.count(c))

    @tornado.testing.gen_test
    def test_websocket_mock_render(self):
        ws = yield tornado.websocket.websocket_connect(
            f"ws://localhost:{self.get_http_port()}/websocket/")
        msg = yield ws.read_message()
        info = json.loads(msg)
        assert info["type"] == "modelinfo"
        pw = info["data"]["patch_width"]
        msg = yield ws.read_message()
        assert json.loads(msg)["type"] == "brushinfo"

        patch = np.zeros((pw, pw, 4), np.uint8)
        patch[10:30, 10:30, 3] = 255
        raw = protocol.encode_render_request(patch, x=0, y=0)
        ws.write_message(raw, binary=True)
        resp = yield ws.read_message()
        rtype, meta, img = protocol.decode_render_response(resp)
        assert rtype == 0
        assert img.shape[-1] == 4
        ws.close()


class TestGanServer(ServerTestBase):
    def _prepare(self):
        bundle = small_bundle()
        self.gan_checkpoint = os.path.join(self.tmpdir, "bundle.pkl")
        save_native(self.gan_checkpoint, bundle)

    @tornado.testing.gen_test(timeout=120)
    def test_full_session(self):
        ws = yield tornado.websocket.websocket_connect(
            f"ws://localhost:{self.get_http_port()}/websocket/")
        info = json.loads((yield ws.read_message()))
        pw = info["data"]["patch_width"]
        yield ws.read_message()  # brushinfo

        # Configure the session like the JS client does.
        ws.write_message(json.dumps({"type": "new_canvas", "rows": 128,
                                     "cols": 128, "feature_blending": 1}))
        ws.write_message(json.dumps({"type": "set_option",
                                     "option": "positions", "value": True}))
        ws.write_message(json.dumps({"type": "set_brush", "seed": 7}))
        yield ws.read_message()  # brushinfo after set_brush

        patch = np.zeros((pw, pw, 4), np.uint8)
        patch[4:20, 4:20, 3] = 255
        raw = protocol.encode_render_request(
            patch, x=16, y=16, crop_margin=4,
            colors=[(0, 200, 30, 30)])
        ws.write_message(raw, binary=True)
        resp = yield ws.read_message()
        rtype, meta, img = protocol.decode_render_response(resp)
        assert rtype == 0
        assert meta == {"x": 20, "y": 20}
        assert img.shape == (pw - 8, pw - 8, 4)

        # Library brush selection.
        ws.write_message(json.dumps({"type": "set_brush",
                                     "library_id": "Lib",
                                     "style_id": "2"}))
        info = json.loads((yield ws.read_message()))
        assert info["data"]["style_id"] == "2"
        ws.close()

    def test_brush_icon_renders(self):
        # Dynamic icons render through the GAN: the first fetch pays the
        # XLA compile, which can exceed tornado's default 5 s async-test
        # timeout on a cold jit cache (flaked in the round-4 suite runs);
        # ASYNC_TEST_TIMEOUT is raised module-wide above.
        resp = self.fetch("/brush/Lib/1.jpg", request_timeout=300,
                          connect_timeout=300)
        assert resp.code == 200
        assert len(resp.body) > 100

    @tornado.testing.gen_test(timeout=120)
    def test_debug_roundtrip(self):
        """A debug-flagged render request yields the normal patch AND an
        rtype==1 debug sheet (the client's debug panel consumes it)."""
        ws = yield tornado.websocket.websocket_connect(
            f"ws://localhost:{self.get_http_port()}/websocket/")
        info = json.loads((yield ws.read_message()))
        pw = info["data"]["patch_width"]
        yield ws.read_message()  # brushinfo
        ws.write_message(json.dumps({"type": "new_canvas", "rows": 128,
                                     "cols": 128, "feature_blending": 0}))
        patch = np.zeros((pw, pw, 4), np.uint8)
        patch[4:20, 4:20, 3] = 255
        raw = protocol.encode_render_request(patch, x=0, y=0, debug=True)
        ws.write_message(raw, binary=True)
        r1 = yield ws.read_message()
        r2 = yield ws.read_message()
        t1, _, img1 = protocol.decode_render_response(r1)
        t2, _, img2 = protocol.decode_render_response(r2)
        assert {t1, t2} == {0, 1}
        dbg = img1 if t1 == 1 else img2
        assert dbg.size > 0 and dbg.shape[-1] == 4
        ws.close()

    @tornado.testing.gen_test(timeout=120)
    def test_interpolated_brush_selection(self):
        """set_brush with style_id2 + alpha selects an interpolated style
        (the client's shift-click + blend slider path)."""
        ws = yield tornado.websocket.websocket_connect(
            f"ws://localhost:{self.get_http_port()}/websocket/")
        yield ws.read_message()  # modelinfo
        yield ws.read_message()  # brushinfo
        ws.write_message(json.dumps({"type": "set_brush",
                                     "library_id": "Lib",
                                     "style_id": "1", "style_id2": "2",
                                     "alpha": 0.25}))
        info = json.loads((yield ws.read_message()))
        assert info["data"]["style_id"] == "1_0.25__2"
        assert info["data"]["library_id"] == "Lib"
        ws.close()


class TestGanServerDeviceCanvas(ServerTestBase):
    def _prepare(self):
        bundle = small_bundle()
        self.gan_checkpoint = os.path.join(self.tmpdir, "bundle.pkl")
        save_native(self.gan_checkpoint, bundle)

    def get_app(self):
        seeds = os.path.join(self.tmpdir, "seeds.txt")
        with open(seeds, "w") as f:
            f.write("1\n2\n3\n")
        return create_server(
            encoder_checkpoint=None,
            gan_checkpoint=self.gan_checkpoint,
            library_specs=[["Lib", "disp", seeds]],
            use_device_canvas=True)

    @tornado.testing.gen_test(timeout=120)
    def test_device_canvas_session(self):
        """--device_canvas: strokes render through the device-resident
        feature canvas (one donated-state dispatch per stroke)."""
        ws = yield tornado.websocket.websocket_connect(
            f"ws://localhost:{self.get_http_port()}/websocket/")
        info = json.loads((yield ws.read_message()))
        pw = info["data"]["patch_width"]
        yield ws.read_message()  # brushinfo

        ws.write_message(json.dumps({"type": "new_canvas", "rows": 128,
                                     "cols": 128, "feature_blending": 2}))
        ws.write_message(json.dumps({"type": "set_option",
                                     "option": "positions", "value": True}))
        ws.write_message(json.dumps({"type": "set_brush", "seed": 3}))
        yield ws.read_message()  # brushinfo

        patch = np.zeros((pw, pw, 4), np.uint8)
        patch[4:20, 4:20, 3] = 255
        for (x, y) in ((16, 16), (32, 16)):   # overlapping strokes
            raw = protocol.encode_render_request(patch, x=x, y=y,
                                                 crop_margin=4)
            ws.write_message(raw, binary=True)
            resp = yield ws.read_message()
            rtype, meta, img = protocol.decode_render_response(resp)
            assert rtype == 0
            assert img.shape == (pw - 8, pw - 8, 4)
            assert np.isfinite(img.astype(np.float32)).all()
        ws.close()


class TestGanServerDeviceBatched(ServerTestBase):
    """--device_canvas + --batch_window_ms: concurrent sessions' device-
    canvas strokes coalesce into ONE pooled dispatch per flush window
    (ui/server.py:DeviceRenderBatcher), each session keeping its own
    canvas slot."""

    def _prepare(self):
        bundle = small_bundle()
        self.gan_checkpoint = os.path.join(self.tmpdir, "bundle.pkl")
        save_native(self.gan_checkpoint, bundle)

    def get_app(self):
        seeds = os.path.join(self.tmpdir, "seeds.txt")
        with open(seeds, "w") as f:
            f.write("1\n2\n3\n")
        return create_server(
            encoder_checkpoint=None,
            gan_checkpoint=self.gan_checkpoint,
            library_specs=[["Lib", "disp", seeds]],
            use_device_canvas=True,
            batch_window_ms=15.0)

    @tornado.testing.gen_test(timeout=240)
    def test_two_sessions_share_one_dispatch(self):
        assert self._app.dev_batcher is not None
        conns = []
        pw = None
        for seed in (3, 9):
            ws = yield tornado.websocket.websocket_connect(
                f"ws://localhost:{self.get_http_port()}/websocket/")
            info = json.loads((yield ws.read_message()))
            pw = info["data"]["patch_width"]
            yield ws.read_message()  # brushinfo
            ws.write_message(json.dumps({"type": "new_canvas", "rows": 128,
                                         "cols": 128,
                                         "feature_blending": 2}))
            ws.write_message(json.dumps({"type": "set_option",
                                         "option": "positions",
                                         "value": True}))
            ws.write_message(json.dumps({"type": "set_option",
                                         "option": "timing", "value": True}))
            ws.write_message(json.dumps({"type": "set_brush", "seed": seed}))
            yield ws.read_message()  # brushinfo after set_brush
            conns.append(ws)

        patch = np.zeros((pw, pw, 4), np.uint8)
        patch[4:24, 4:24, 3] = 255
        raw0 = protocol.encode_render_request(patch, x=16, y=16)
        raw1 = protocol.encode_render_request(patch, x=32, y=32)
        for _round in range(2):  # round 2 exercises stored-feature rows
            conns[0].write_message(raw0, binary=True)
            conns[1].write_message(raw1, binary=True)
            imgs = []
            for ws, want_xy in zip(conns, ((16, 16), (32, 32))):
                resp = yield ws.read_message()
                rtype, meta, img = protocol.decode_render_response(resp)
                assert rtype == 0
                assert (meta["x"], meta["y"]) == want_xy
                assert img.shape == (pw, pw, 4)
                assert np.isfinite(img.astype(np.float32)).all()
                timing = json.loads((yield ws.read_message()))
                assert timing["type"] == "timing"
                assert timing["data"]["path"] == "device_batched"
                imgs.append(img)
            assert not np.array_equal(imgs[0], imgs[1])  # styles differ
        # Both sessions hold distinct slots of the same pool.
        pools = list(self._app.dev_batcher.pools.values())
        assert len(pools) == 1
        assert len(pools[0]._free) == pools[0]._capacity - 2
        for ws in conns:
            ws.close()

    @tornado.testing.gen_test(timeout=240)
    def test_same_session_burst_stays_ordered(self):
        """A burst of strokes from one session must come back in order,
        each blending against its predecessor's write-back (at most one
        request per session per flush)."""
        ws = yield tornado.websocket.websocket_connect(
            f"ws://localhost:{self.get_http_port()}/websocket/")
        info = json.loads((yield ws.read_message()))
        pw = info["data"]["patch_width"]
        yield ws.read_message()
        ws.write_message(json.dumps({"type": "new_canvas", "rows": 128,
                                     "cols": 128, "feature_blending": 2}))
        ws.write_message(json.dumps({"type": "set_option",
                                     "option": "positions", "value": True}))
        ws.write_message(json.dumps({"type": "set_brush", "seed": 3}))
        yield ws.read_message()

        patch = np.zeros((pw, pw, 4), np.uint8)
        patch[4:24, 4:24, 3] = 255
        xs = (0, 16, 32)
        for x in xs:  # burst: no reads between writes
            ws.write_message(protocol.encode_render_request(
                patch, x=x, y=16, extra_data=x), binary=True)
        for x in xs:
            resp = yield ws.read_message()
            rtype, meta, img = protocol.decode_render_response(resp)
            assert rtype == x, "responses out of order"
            assert (meta["x"], meta["y"]) == (x, 16)
        # Repeat stroke at a painted spot: stored features dominate.
        ws.write_message(protocol.encode_render_request(patch, x=16, y=16),
                         binary=True)
        resp = yield ws.read_message()
        _, _, again = protocol.decode_render_response(resp)
        assert np.isfinite(again.astype(np.float32)).all()
        # new_canvas releases the slot back to the pool.
        pool = list(self._app.dev_batcher.pools.values())[0]
        free_before = len(pool._free)
        ws.write_message(json.dumps({"type": "new_canvas", "rows": 128,
                                     "cols": 128, "feature_blending": 2}))
        yield tornado.gen.sleep(0.1)
        assert len(pool._free) == free_before + 1
        ws.close()


class TestGanServerBatched(ServerTestBase):
    """Cross-session micro-batching: requests from two concurrent sessions
    coalesce into one device dispatch and each gets its own style's patch."""

    def _prepare(self):
        bundle = small_bundle()
        self.gan_checkpoint = os.path.join(self.tmpdir, "bundle.pkl")
        save_native(self.gan_checkpoint, bundle)

    def get_app(self):
        seeds = os.path.join(self.tmpdir, "seeds.txt")
        with open(seeds, "w") as f:
            f.write("1\n2\n3\n")
        return create_server(
            encoder_checkpoint=None,
            gan_checkpoint=self.gan_checkpoint,
            library_specs=[["Lib", "disp", seeds]],
            batch_window_ms=20.0)

    @tornado.testing.gen_test(timeout=240)
    def test_two_sessions_batch(self):
        import tornado.gen

        conns = []
        pw = None
        for seed in (3, 9):
            ws = yield tornado.websocket.websocket_connect(
                f"ws://localhost:{self.get_http_port()}/websocket/")
            info = json.loads((yield ws.read_message()))
            pw = info["data"]["patch_width"]
            yield ws.read_message()  # brushinfo
            ws.write_message(json.dumps({"type": "new_canvas", "rows": 128,
                                         "cols": 128,
                                         "feature_blending": 1}))
            ws.write_message(json.dumps({"type": "set_option",
                                         "option": "positions",
                                         "value": True}))
            ws.write_message(json.dumps({"type": "set_brush", "seed": seed}))
            yield ws.read_message()  # brushinfo after set_brush
            conns.append(ws)

        patch = np.zeros((pw, pw, 4), np.uint8)
        patch[4:24, 4:24, 3] = 255
        # Different user colors per session so the rows must not mix.
        raw0 = protocol.encode_render_request(patch, x=16, y=16,
                                              colors=[(0, 255, 0, 0)])
        raw1 = protocol.encode_render_request(patch, x=32, y=32,
                                              colors=[(0, 0, 0, 255)])
        conns[0].write_message(raw0, binary=True)
        conns[1].write_message(raw1, binary=True)

        resp0 = yield conns[0].read_message()
        resp1 = yield conns[1].read_message()
        _, meta0, img0 = protocol.decode_render_response(resp0)
        _, meta1, img1 = protocol.decode_render_response(resp1)
        assert meta0 == {"x": 16, "y": 16}
        assert meta1 == {"x": 32, "y": 32}
        assert img0.shape == (pw, pw, 4) and img1.shape == (pw, pw, 4)
        # Different styles and colors -> different renders.
        assert not np.array_equal(img0, img1)
        # Session 0 forced a red primary: its stroke has more red than blue.
        fg0 = img0[..., 3] > 128
        if fg0.any():
            assert img0[fg0, 0].astype(int).mean() >= \
                img0[fg0, 2].astype(int).mean()

        # A second stroke per session exercises the stored-features rows.
        conns[0].write_message(raw0, binary=True)
        conns[1].write_message(raw1, binary=True)
        r0 = yield conns[0].read_message()
        r1 = yield conns[1].read_message()
        assert isinstance(r0, bytes) and isinstance(r1, bytes)
        for ws in conns:
            ws.close()

    @tornado.testing.gen_test(timeout=240)
    def test_mixed_fresh_and_stored_rows(self):
        """A batch mixing a session WITH stored canvas features and a fresh
        session must blend only the former (alpha-zero padding rows)."""
        conns = []
        pw = None
        for seed in (5, 6):
            ws = yield tornado.websocket.websocket_connect(
                f"ws://localhost:{self.get_http_port()}/websocket/")
            info = json.loads((yield ws.read_message()))
            pw = info["data"]["patch_width"]
            yield ws.read_message()
            ws.write_message(json.dumps({"type": "new_canvas", "rows": 128,
                                         "cols": 128,
                                         "feature_blending": 1}))
            ws.write_message(json.dumps({"type": "set_option",
                                         "option": "positions",
                                         "value": True}))
            ws.write_message(json.dumps({"type": "set_brush", "seed": seed}))
            yield ws.read_message()
            conns.append(ws)

        patch = np.zeros((pw, pw, 4), np.uint8)
        patch[8:24, 8:24, 3] = 255
        raw = protocol.encode_render_request(patch, x=16, y=16)
        # Session 0 paints once alone: it now has stored features.
        conns[0].write_message(raw, binary=True)
        first = yield conns[0].read_message()
        assert isinstance(first, bytes)
        # Now both paint simultaneously: row 0 has stored features, row 1
        # is fresh; both must come back well-formed.
        conns[0].write_message(raw, binary=True)
        conns[1].write_message(raw, binary=True)
        r0 = yield conns[0].read_message()
        r1 = yield conns[1].read_message()
        _, m0, i0 = protocol.decode_render_response(r0)
        _, m1, i1 = protocol.decode_render_response(r1)
        assert i0.shape == (pw, pw, 4) and i1.shape == (pw, pw, 4)
        # Session 0's repeat render at the same spot stays close to its
        # first render (stored features dominate).
        _, _, ifirst = protocol.decode_render_response(first)
        diff = np.abs(i0.astype(int) - ifirst.astype(int)).mean()
        assert diff < 4.0
        for ws in conns:
            ws.close()


class TestRenderBatcherSemantics:
    """Direct RenderBatcher unit tests (flush driven manually): same-session
    bursts must match the serial path, and one failing group must not drop
    other sessions' responses."""

    def _engine(self):
        from tests.helpers import make_engine
        return make_engine(small_bundle())

    def _helper(self, eng):
        from brushstroke_engine_tpu.engine.canvas import PaintingHelper
        h = PaintingHelper(eng, style_seed=0)
        h.make_new_canvas(128, 128, feature_blending=1)
        return h

    def _batcher(self, eng):
        from brushstroke_engine_tpu.ui.server import RenderBatcher
        b = RenderBatcher(eng, window_ms=1000.0)
        b.start = lambda: None  # no IOLoop here; flush() driven manually
        return b

    @staticmethod
    def _patch(pw):
        p = np.zeros((pw, pw, 4), np.uint8)
        p[4:20, 4:20, 3] = 255
        return p

    def _opts(self, helper, x, y):
        o = helper.default_brush_options()
        o.set_position(x, y)
        return o

    def test_same_helper_burst_matches_serial(self):
        eng = self._engine()
        pw = eng.patch_width
        patch = self._patch(pw)

        # Serial reference: the second overlapping stroke blends against
        # the first one's written-back features.
        hs = self._helper(eng)
        serial = []
        for (x, y) in [(16, 16), (24, 16)]:
            img, _, meta = hs.render_stroke(
                patch, None, self._opts(hs, x, y), meta={"x": x, "y": y})
            serial.append((img, meta))

        # Batched: both submitted before any flush; the batcher must defer
        # the second until the first's write-back (one per helper per
        # flush), not render both against the same stale canvas.
        hb = self._helper(eng)
        b = self._batcher(eng)
        results = []
        for (x, y) in [(16, 16), (24, 16)]:
            b.submit(hb, self._opts(hb, x, y), patch, {"x": x, "y": y},
                     lambda img, m: results.append((img, m)))
        b.flush()
        assert len(results) == 1, "second same-session request must defer"
        b.flush()
        assert len(results) == 2
        assert not b.items
        for (img_s, meta_s), (img_b, meta_b) in zip(serial, results):
            # Ignore the private timing stamps the batcher adds for the
            # SLO side-channel.
            assert {k: v for k, v in meta_b.items()
                    if not k.startswith("_")} == meta_s
            diff = np.abs(img_s.astype(int) - img_b.astype(int)).mean()
            assert diff < 2.0, f"batched path diverged from serial: {diff}"

    def test_flush_survives_batch_failure(self, monkeypatch):
        eng = self._engine()
        pw = eng.patch_width
        patch = self._patch(pw)
        b = self._batcher(eng)
        results = []
        for i in range(2):  # two different sessions -> one group
            h = self._helper(eng)
            b.submit(h, self._opts(h, 16, 16), patch, {"x": 16, "y": 16},
                     lambda img, m: results.append((img, m)))

        def boom(*a, **kw):
            raise RuntimeError("injected batch failure")

        monkeypatch.setattr(eng, "render_batch", boom)
        b.flush()
        # Both sessions still get responses via the per-request fallback.
        assert len(results) == 2
        for img, meta in results:
            assert img.shape == (pw, pw, 4)
            assert {k: v for k, v in meta.items()
                    if not k.startswith("_")} == {"x": 16, "y": 16}

    def test_one_bad_respond_does_not_drop_others(self):
        eng = self._engine()
        pw = eng.patch_width
        patch = self._patch(pw)
        b = self._batcher(eng)
        results = []

        def bad_respond(img, m):
            raise RuntimeError("client went away")

        h1, h2 = self._helper(eng), self._helper(eng)
        b.submit(h1, self._opts(h1, 16, 16), patch, {"x": 16, "y": 16},
                 bad_respond)
        b.submit(h2, self._opts(h2, 16, 16), patch, {"x": 16, "y": 16},
                 lambda img, m: results.append((img, m)))
        b.flush()
        assert len(results) == 1
        assert results[0][0].shape == (pw, pw, 4)


class TestTimingSideChannel(ServerTestBase):
    """set_option timing=1: every binary render response is followed by a
    JSON timing message decomposing queue/render/server cost -- the
    instrumentation behind the serving-SLO decomposition (the binary wire
    format stays reference-identical)."""

    def _prepare(self):
        bundle = small_bundle()
        self.gan_checkpoint = os.path.join(self.tmpdir, "bundle.pkl")
        save_native(self.gan_checkpoint, bundle)

    def get_app(self):
        return create_server(
            encoder_checkpoint=None,
            gan_checkpoint=self.gan_checkpoint,
            library_specs=[],
            use_device_canvas=True)

    @tornado.testing.gen_test(timeout=120)
    def test_timing_messages(self):
        ws = yield tornado.websocket.websocket_connect(
            f"ws://localhost:{self.get_http_port()}/websocket/")
        info = json.loads((yield ws.read_message()))
        pw = info["data"]["patch_width"]
        yield ws.read_message()  # brushinfo

        ws.write_message(json.dumps({"type": "new_canvas", "rows": 128,
                                     "cols": 128, "feature_blending": 2}))
        ws.write_message(json.dumps({"type": "set_option",
                                     "option": "positions", "value": True}))
        ws.write_message(json.dumps({"type": "set_option",
                                     "option": "timing", "value": True}))

        patch = np.zeros((pw, pw, 4), np.uint8)
        patch[4:20, 4:20, 3] = 255
        seqs = []
        for i, (x, y) in enumerate(((16, 16), (32, 16))):
            raw = protocol.encode_render_request(patch, x=x, y=y,
                                                 crop_margin=4)
            ws.write_message(raw, binary=True)
            resp = yield ws.read_message()
            rtype, _meta, _img = protocol.decode_render_response(resp)
            assert rtype == 0
            timing = json.loads((yield ws.read_message()))
            assert timing["type"] == "timing"
            d = timing["data"]
            seqs.append(d["seq"])
            assert d["path"] == "device_canvas"
            assert 0 <= d["queue_ms"] < d["server_ms"]
            assert 0 < d["render_ms"] <= d["server_ms"]
            assert d["server_ms"] >= d["queue_ms"] + d["render_ms"] - 0.01
        assert seqs == [0, 1]

        # Opt back out: next stroke gets ONLY the binary response.
        ws.write_message(json.dumps({"type": "set_option",
                                     "option": "timing", "value": False}))
        ws.write_message(protocol.encode_render_request(
            patch, x=48, y=16, crop_margin=4), binary=True)
        resp = yield ws.read_message()
        assert isinstance(resp, bytes)
        ws.write_message(json.dumps({"type": "set_brush", "seed": 5}))
        nxt = json.loads((yield ws.read_message()))
        assert nxt["type"] == "brushinfo"   # no timing in between
        ws.close()
