"""Tests for the device-resident feature canvas path."""

import numpy as np
import pytest

import jax.numpy as jnp

from brushstroke_engine_tpu.engine.brush import GanBrushOptions
from brushstroke_engine_tpu.engine.device_canvas import (
    DeviceCanvasPool, DevicePaintSession, init_canvas_state, _blend_alpha,
)
from tests.helpers import make_engine


def stroke_patch(width, seed=0):
    rng = np.random.default_rng(seed)
    patch = np.zeros((width, width, 4), np.uint8)
    y = rng.integers(4, width - 12)
    patch[y:y + 8, 4:width - 4, 3] = 255
    return patch


class TestBlendAlpha:
    def test_empty_mask_no_blend(self):
        mask = jnp.zeros((32, 32))
        alpha, update = _blend_alpha(mask, blend_margin=4, crop_margin=0)
        np.testing.assert_allclose(np.asarray(alpha), 0.0)
        assert np.asarray(update)[16, 16] == 1.0

    def test_full_mask_blends_at_border(self):
        mask = jnp.ones((32, 32))
        alpha, update = _blend_alpha(mask, blend_margin=4, crop_margin=0)
        a = np.asarray(alpha)[..., 0]
        assert a[0, 16] > 0.9      # border keeps stored features
        assert a[16, 16] == 0.0    # interior uses fresh render


class TestDeviceSession:
    def test_session_paints_and_updates_canvas(self):
        eng = make_engine()
        sess = DevicePaintSession(eng, 128, 128, feature_blending_level=1)
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(5), 5)
        img, meta = sess.render_stroke(stroke_patch(eng.patch_width), opts,
                                       x=0, y=0)
        assert img.shape == (32, 32, 4)
        assert float(np.asarray(sess.canvas.mask).max()) == 1.0

    def test_repeat_same_position_is_stable(self):
        eng = make_engine()
        sess = DevicePaintSession(eng, 128, 128, feature_blending_level=1)
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(5), 5)
        p = stroke_patch(eng.patch_width, seed=1)
        img1, _ = sess.render_stroke(p, opts, x=32, y=32)
        img2, _ = sess.render_stroke(p, opts, x=32, y=32)
        diff = np.abs(img1.astype(int) - img2.astype(int)).mean()
        assert diff < 8.0

    def test_positions_do_not_retrace(self):
        """Different positions must reuse the same compiled program."""
        from brushstroke_engine_tpu.engine.device_canvas import \
            render_stroke_packed
        eng = make_engine()
        sess = DevicePaintSession(eng, 256, 256, feature_blending_level=1)
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(5), 5)
        p = stroke_patch(eng.patch_width, seed=2)
        sess.render_stroke(p, opts, x=0, y=0)
        n0 = render_stroke_packed._cache_size()
        sess.render_stroke(p, opts, x=64, y=128)
        sess.render_stroke(p, opts, x=192, y=32)
        assert render_stroke_packed._cache_size() == n0

    def test_packed_matches_step(self):
        """The single-upload packed program must equal the plain-args one."""
        import jax.numpy as jnp
        from brushstroke_engine_tpu.engine.device_canvas import (
            render_stroke_step, init_canvas_state,
        )
        eng = make_engine()
        sess = DevicePaintSession(eng, 128, 128, feature_blending_level=1)
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(5), 5)
        p = stroke_patch(eng.patch_width, seed=4)
        img_packed, _ = sess.render_stroke(p, opts, x=32, y=64)

        geom = eng.prepare_geom_input(p).reshape(1, eng.patch_width,
                                                 eng.patch_width, 1)
        opts.prepare_style(1)
        canvas = init_canvas_state(128, 128, sess.down,
                                   sess.canvas.features.shape[-1])
        rgba, _ = render_stroke_step(
            eng.gen_cfg, eng.enc_cfg, tuple(eng.enc_res), eng.render_mode,
            sess.blend_res, sess.blend_margin, sess.crop_margin,
            sess._params, canvas, jnp.asarray(geom), jnp.asarray([64, 32]),
            jnp.asarray(opts.style_z, jnp.float32), None, None, None)
        img_step = np.clip(np.asarray(rgba[0]) * 255, 0, 255) \
            .astype(np.uint8)
        np.testing.assert_array_equal(img_packed, img_step)

    def test_color_override(self):
        eng = make_engine()
        sess = DevicePaintSession(eng, 64, 64, feature_blending_level=1)
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(5), 5)
        p = stroke_patch(eng.patch_width, seed=3)
        base, _ = sess.render_stroke(p, opts, x=0, y=0)
        opts.set_color(0, np.asarray([255, 0, 0], np.uint8))
        red, _ = sess.render_stroke(p, opts, x=0, y=0)
        assert not np.array_equal(base, red)


class TestDeviceCanvasPool:
    """Pooled cross-session batching: N sessions' strokes in ONE dispatch
    (engine/device_canvas.py:render_strokes_pool)."""

    @staticmethod
    def _req(eng, slot, patch, opts, x, y):
        # Raw wire alpha (uint8): the pooled kernel runs the
        # prepare_geom_input inversion on device.
        return {"slot": slot, "x": x, "y": y, "opts": opts,
                "geom": np.ascontiguousarray(patch[:, :, -1]).ravel()}

    def test_pooled_matches_serial_sessions(self):
        """Two sessions' interleaved strokes through the pool must match two
        independent DevicePaintSessions (same styles, same positions,
        overlapping second strokes) to within u8 rounding of the batched
        matmul reassociation."""
        eng = make_engine()
        pw = eng.patch_width
        opts_a = GanBrushOptions()
        opts_a.set_style(eng.random_style(1), 1)
        opts_b = GanBrushOptions()
        opts_b.set_style(eng.random_style(2), 2)
        opts_b.set_color(0, np.asarray([255, 0, 0], np.uint8))
        pa1, pa2 = stroke_patch(pw, 1), stroke_patch(pw, 2)
        pb1, pb2 = stroke_patch(pw, 3), stroke_patch(pw, 4)

        sa = DevicePaintSession(eng, 128, 128, feature_blending_level=1)
        sb = DevicePaintSession(eng, 128, 128, feature_blending_level=1)
        ra1, ma1 = sa.render_stroke(pa1, opts_a, x=16, y=16)
        rb1, mb1 = sb.render_stroke(pb1, opts_b, x=0, y=0)
        ra2, ma2 = sa.render_stroke(pa2, opts_a, x=32, y=16)  # overlaps
        rb2, mb2 = sb.render_stroke(pb2, opts_b, x=16, y=0)

        pool = DeviceCanvasPool(eng, 128, 128, feature_blending_level=1,
                                capacity=2)
        slot_a, slot_b = pool.acquire(), pool.acquire()
        rgba, metas = pool.render_batch(
            [self._req(eng, slot_a, pa1, opts_a, 16, 16),
             self._req(eng, slot_b, pb1, opts_b, 0, 0)])
        out1 = np.asarray(rgba)
        rgba, metas2 = pool.render_batch(
            [self._req(eng, slot_a, pa2, opts_a, 32, 16),
             self._req(eng, slot_b, pb2, opts_b, 16, 0)])
        out2 = np.asarray(rgba)

        assert metas == [ma1, mb1] and metas2 == [ma2, mb2]
        for got, want in [(out1[0], ra1), (out1[1], rb1),
                          (out2[0], ra2), (out2[1], rb2)]:
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_padding_rows_only_touch_scratch(self):
        """A 3-request batch pads to bucket 4; the padding row must write
        only the scratch slot, never a real session's canvas."""
        eng = make_engine()
        pw = eng.patch_width
        pool = DeviceCanvasPool(eng, 128, 128, feature_blending_level=1,
                                capacity=4)
        slots = [pool.acquire() for _ in range(4)]
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(7), 7)
        p = stroke_patch(pw, 5)
        # Paint slot 3 alone so it has stored state to corrupt.
        pool.render_batch([self._req(eng, slots[3], p, opts, 16, 16)])
        mask3_before = np.asarray(pool.state.mask[slots[3]])
        feats3_before = np.asarray(pool.state.features[slots[3]])
        # 3 requests (slots 0-2) -> bucket 4 -> one pad row at x=(48,48).
        pool.render_batch([
            self._req(eng, slots[0], p, opts, 16, 16),
            self._req(eng, slots[1], p, opts, 32, 32),
            self._req(eng, slots[2], p, opts, 48, 48)])
        np.testing.assert_array_equal(
            np.asarray(pool.state.mask[slots[3]]), mask3_before)
        np.testing.assert_array_equal(
            np.asarray(pool.state.features[slots[3]]), feats3_before)

    def test_pool_grows_and_new_slot_renders(self):
        eng = make_engine()
        pw = eng.patch_width
        pool = DeviceCanvasPool(eng, 64, 64, feature_blending_level=1,
                                capacity=1)
        s0 = pool.acquire()
        s1 = pool.acquire()  # forces a grow
        assert s1 != s0 and pool.scratch_slot not in (s0, s1)
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(1), 1)
        p = stroke_patch(pw, 6)
        rgba, metas = pool.render_batch(
            [self._req(eng, s0, p, opts, 0, 0),
             self._req(eng, s1, p, opts, 0, 0)])
        out = np.asarray(rgba)
        # Same style, same fresh canvases: the two rows must agree.
        assert np.abs(out[0].astype(int) - out[1].astype(int)).max() <= 1

    def test_reset_slot_invalidates_features(self):
        eng = make_engine()
        pw = eng.patch_width
        pool = DeviceCanvasPool(eng, 64, 64, feature_blending_level=1,
                                capacity=1)
        s = pool.acquire()
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(3), 3)
        p = stroke_patch(pw, 7)
        pool.render_batch([self._req(eng, s, p, opts, 0, 0)])
        assert float(np.asarray(pool.state.mask[s]).max()) == 1.0
        pool.reset_slot(s)
        assert float(np.asarray(pool.state.mask[s]).max()) == 0.0


class TestDispatchFetchSplit:
    def test_pipelined_dispatch_matches_serial(self):
        """The dispatch/fetch split exists so a server can enqueue the next
        stroke before the previous one's pixels reach the host.  Dispatch
        two OVERLAPPING strokes back-to-back (no fetch in between: the
        canvas state advances as a device future), then fetch both; the
        results must match the serial render_stroke sequence bit-exactly on
        an identically seeded fresh session."""
        eng = make_engine()
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(5), 5)
        pa = stroke_patch(eng.patch_width, seed=2)
        pb = stroke_patch(eng.patch_width, seed=3)

        sess1 = DevicePaintSession(eng, 128, 128, feature_blending_level=1)
        ra, ma = sess1.render_stroke_dispatch(pa, opts, x=32, y=32)
        rb, mb = sess1.render_stroke_dispatch(pb, opts, x=48, y=32)
        img_a, img_b = sess1.fetch(ra), sess1.fetch(rb)

        sess2 = DevicePaintSession(eng, 128, 128, feature_blending_level=1)
        sa, mas = sess2.render_stroke(pa, opts, x=32, y=32)
        sb, mbs = sess2.render_stroke(pb, opts, x=48, y=32)

        assert ma == mas and mb == mbs
        np.testing.assert_array_equal(img_a, sa)
        np.testing.assert_array_equal(img_b, sb)
