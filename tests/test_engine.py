"""Tests for the paint engine: render core, options, canvas, libraries,
mapper, stylization."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from brushstroke_engine_tpu.engine import areas
from brushstroke_engine_tpu.engine.brush import (
    GanBrushOptions, MockPaintEngine,
)
from brushstroke_engine_tpu.engine.canvas import (
    FeatureCanvas, PaintingHelper, generate_dirty_area_alpha,
)
from brushstroke_engine_tpu.engine.library import (
    BrushLibrary, SeedBrushLibrary, WBrushLibrary, RandomBrushLibrary,
)
from brushstroke_engine_tpu.engine.render import map_uvs_s
from brushstroke_engine_tpu.engine.stylize import (
    generate_stitching_crops, pad_geometry, stylize_image,
)
from brushstroke_engine_tpu.data.curated_geometry import (
    curated_geometry_patch,
)
from tests.helpers import small_bundle, make_engine


def stroke_patch_uint8(width, radius=6):
    geom = curated_geometry_patch("curve", radius=16, width=width)
    patch = np.zeros((width, width, 4), np.uint8)
    patch[..., 3] = ((1.0 - geom) * 255).astype(np.uint8)
    return patch


class TestAreas:
    def test_make_and_overlap(self):
        a = areas.make_area(0, 0, 10, 10)
        b = areas.make_area(5, 5, 10, 10)
        abs_ov, rel_a, rel_b = areas.compute_overlaps(
            (0, 0, 10, 10), (5, 5, 10, 10))
        assert (abs_ov.rstart, abs_ov.cstart, abs_ov.rend, abs_ov.cend) == \
            (5, 5, 10, 10)
        assert (rel_a.rstart, rel_a.cstart) == (5, 5)
        assert (rel_b.rstart, rel_b.cstart) == (0, 0)
        del a, b

    def test_no_overlap(self):
        abs_ov, rel_a, rel_b = areas.compute_overlaps(
            (0, 0, 4, 4), (10, 10, 4, 4))
        assert rel_a is None and rel_b is None
        assert abs_ov.min_width <= 0

    def test_expand_clip(self):
        a = areas.make_area(60, 60, 4, 4)
        e = areas.expand_area(a, 16, 64, 64)
        assert e.rows == 16 and e.cols == 16
        assert e.rend <= 64 and e.cend <= 64

    def test_pad_bounded(self):
        a = areas.make_area(5, 5, 10, 10)
        p = areas.pad_area_bounded(a, margin=4, max_dim=16)
        assert p.rows == 16 and p.cols == 16


class TestRenderEngine:
    def test_triad_render_stroke(self):
        eng = make_engine()
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(42), 42)
        patch = stroke_patch_uint8(eng.patch_width)
        img, dbg = eng.render_stroke(patch, None, opts)
        assert img.shape == (eng.patch_width, eng.patch_width, 4)
        assert img.dtype == np.uint8

    def test_full_vs_clear_alpha(self):
        eng = make_engine()
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(1), 1)
        patch = stroke_patch_uint8(eng.patch_width)
        eng.set_render_mode("full")
        img_full, _ = eng.render_stroke(patch, None, opts)
        assert (img_full[..., 3] == 255).all()
        eng.set_render_mode("clear")
        img_clear, _ = eng.render_stroke(patch, None, opts)
        assert img_clear[..., 3].min() < 255

    def test_color_override(self):
        eng = make_engine()
        eng.set_render_mode("full")
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(1), 1)
        patch = stroke_patch_uint8(eng.patch_width)
        img_default, _ = eng.render_stroke(patch, None, opts)
        opts.set_color(0, np.asarray([255, 0, 0], np.uint8))
        opts.set_color(1, np.asarray([0, 255, 0], np.uint8))
        opts.set_color(2, np.asarray([0, 0, 255], np.uint8))
        img_colored, _ = eng.render_stroke(patch, None, opts)
        assert not np.array_equal(img_default, img_colored)

    def test_canvas_engine_modes(self):
        eng = make_engine(color_format="canvas")
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(7), 7)
        patch = stroke_patch_uint8(eng.patch_width)
        for mode in ("clear", "full", "stroke", "canvas"):
            eng.set_render_mode(mode)
            img, _ = eng.render_stroke(patch, None, opts)
            assert img.shape[-1] == 4

    def test_ws_path_with_noise_buffers(self):
        eng = make_engine()
        opts = GanBrushOptions()
        ws = np.random.RandomState(0).randn(
            1, eng.gen_cfg.num_ws, eng.gen_cfg.w_dim)
        noise = {"b32.conv1.noise_const":
                 np.random.RandomState(1).randn(32, 32).astype(np.float32)}
        opts.set_style_w(ws, "proj0", custom_args={"noise_buffers": noise})
        patch = stroke_patch_uint8(eng.patch_width)
        img, _ = eng.render_stroke(patch, None, opts)
        assert img.shape[-1] == 4

    def test_debug_image(self):
        eng = make_engine()
        opts = GanBrushOptions(debug=True)
        opts.set_style(eng.random_style(3), 3)
        patch = stroke_patch_uint8(eng.patch_width)
        _, dbg = eng.render_stroke(patch, None, opts)
        assert dbg is not None and dbg.ndim == 3

    def test_mock_engine(self):
        eng = MockPaintEngine(32)
        canvas = np.zeros((32, 32, 4), np.uint8)
        img, _ = eng.render_stroke(None, canvas, None)
        assert (img[0, :, 0] == 255).all()


class TestUvsMapping:
    def test_map_uvs_s_partition(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        uvs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        mapped = np.asarray(map_uvs_s(jnp.asarray(uvs), 1.5))
        np.testing.assert_allclose(mapped.sum(-1), 1.0, atol=1e-5)
        assert (mapped[..., 2] >= uvs[..., 2] - 1e-6).all()

    def test_sfactor_and_mapping_path(self):
        eng = make_engine()
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(5), 5)
        opts.enable_uvs_mapping = True
        patch = stroke_patch_uint8(eng.patch_width)
        img, _ = eng.render_stroke(patch, None, opts)
        sf = eng.uvs_mapper.sfactors[5]
        assert np.isfinite(sf) and sf > 0

    def test_brush_icon(self):
        eng = make_engine()
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(5), 5)
        icon = eng.uvs_mapper.get_brush_icon(opts)
        assert icon.shape == (eng.patch_width, eng.patch_width, 3)
        assert icon.dtype == np.uint8
        spec = eng.uvs_mapper.get_colors(opts)
        assert spec.count("rgb(") == 3


class TestFeatureCanvas:
    def test_set_get_roundtrip(self):
        fc = FeatureCanvas(64, 64, down_factor=2)
        area = areas.make_area(0, 0, 16, 16)
        feats = np.random.RandomState(0).randn(1, 16, 16, 8).astype(
            np.float32)
        fc.set_features(area, feats)
        mask, got = fc.get_features(area)
        assert mask.all()
        np.testing.assert_allclose(got, feats)

    def test_partial_update_mask(self):
        fc = FeatureCanvas(32, 32, down_factor=1)
        area = areas.make_area(0, 0, 8, 8)
        f1 = np.zeros((1, 8, 8, 2), np.float32)
        fc.set_features(area, f1)
        f2 = np.ones((1, 8, 8, 2), np.float32)
        m = np.zeros((8, 8), bool)
        m[:4] = True
        fc.set_features(area, f2, update_mask=m)
        _, got = fc.get_features(area)
        assert (got[0, :4] == 1).all()
        assert (got[0, 4:] == 0).all()

    def test_dirty_alpha(self):
        a = generate_dirty_area_alpha(areas.make_area(4, 4, 8, 8), 16,
                                      margin=4)
        assert a.shape == (16, 16)
        assert a[8, 8] == 1.0
        assert a[0, 0] == 0.0
        assert 0 < a[2, 8] < 1


class TestPaintingHelper:
    def test_render_with_feature_blending(self):
        eng = make_engine()
        helper = PaintingHelper(eng, style_seed=0)
        helper.make_new_canvas(128, 128, feature_blending=1)
        opts = helper.default_brush_options()
        patch = stroke_patch_uint8(eng.patch_width)
        img1, _, meta1 = helper.render_stroke(patch, None, opts,
                                              meta={"x": 0, "y": 0})
        img2, _, meta2 = helper.render_stroke(patch, None, opts,
                                              meta={"x": 16, "y": 0})
        assert img1.shape == (32, 32, 4)
        assert meta2 == {"x": 16, "y": 0}
        assert helper.feature_canvas.mask.any()

    def test_canvas_smaller_than_patch_rejected(self):
        # A sub-patch canvas has no valid render geometry; must fail with a
        # clear protocol-level error, not a deep mask-broadcast crash
        # (found by driving the live server with a 1x1 new_canvas).
        eng = make_engine()
        helper = PaintingHelper(eng, style_seed=0)
        with pytest.raises(ValueError, match="smaller than patch_width"):
            helper.make_new_canvas(1, 1, feature_blending=1)
        with pytest.raises(ValueError, match="smaller than patch_width"):
            helper.make_new_canvas(eng.patch_width, eng.patch_width - 1,
                                   feature_blending=0)

    def test_overlap_blending_reduces_seam(self):
        """Rendering the same geometry at the same position twice with
        blending returns a (near-)identical patch: stored features dominate."""
        eng = make_engine()
        helper = PaintingHelper(eng, style_seed=0)
        helper.make_new_canvas(256, 256, feature_blending=1)
        opts = helper.default_brush_options()
        patch = stroke_patch_uint8(eng.patch_width)
        img1, _, _ = helper.render_stroke(patch, None, opts,
                                          meta={"x": 32, "y": 32})
        img2, _, _ = helper.render_stroke(patch, None, opts,
                                          meta={"x": 32, "y": 32})
        diff = np.abs(img1.astype(int) - img2.astype(int)).mean()
        assert diff < 2.0

    def test_partial_patch_render(self):
        """A smaller-than-patch dirty region renders with surrounding canvas
        context (beyond the reference, which raises on this path)."""
        eng = make_engine()
        pw = eng.patch_width
        helper = PaintingHelper(eng, style_seed=0)
        helper.make_new_canvas(128, 128, feature_blending=1)
        opts = helper.default_brush_options()

        # Full patch first: populates the geometry + feature canvases.
        patch = stroke_patch_uint8(pw)
        helper.render_stroke(patch, None, opts, meta={"x": 32, "y": 32})
        assert helper.geom_canvas[32:32 + pw, 32:32 + pw].min() < 0.5

        # Now a half-size dirty region inside the painted area.
        half = pw // 2
        small = np.zeros((half, half, 4), np.uint8)
        small[..., 3] = 255   # fully opaque: solid foreground
        img, _, meta = helper.render_stroke(small, None, opts,
                                            meta={"x": 40, "y": 40})
        assert img.shape == (pw, pw, 4)
        # The returned gen area is a full patch containing the dirty region.
        assert meta["x"] <= 40 and meta["y"] <= 40
        assert meta["x"] + pw <= 128 and meta["y"] + pw <= 128
        # The dirty write landed in the geometry canvas (0 = foreground).
        assert helper.geom_canvas[40:40 + half, 40:40 + half].max() == 0.0

    def test_partial_patch_requires_canvas(self):
        eng = make_engine()
        helper = PaintingHelper(eng, style_seed=0)
        opts = helper.default_brush_options()
        small = np.zeros((8, 8, 4), np.uint8)
        with pytest.raises(RuntimeError):
            helper.render_stroke(small, None, opts, meta={"x": 0, "y": 0})
        helper.make_new_canvas(64, 64, feature_blending=0)
        with pytest.raises(RuntimeError):
            helper.render_stroke(small, None, opts, meta=None)

    def test_partial_patch_no_blending(self):
        """Partial patches also work with feature blending off."""
        eng = make_engine()
        pw = eng.patch_width
        helper = PaintingHelper(eng, style_seed=0)
        helper.make_new_canvas(96, 96, feature_blending=0)
        opts = helper.default_brush_options()
        small = np.zeros((pw // 2, pw // 2, 4), np.uint8)
        small[..., 3] = 255
        img, _, meta = helper.render_stroke(small, None, opts,
                                            meta={"x": 70, "y": 70})
        assert img.shape == (pw, pw, 4)
        # Clamped so the generated patch stays inside the canvas.
        assert meta["x"] + pw <= 96 and meta["y"] + pw <= 96

    def test_crop_margin(self):
        eng = make_engine()
        helper = PaintingHelper(eng, style_seed=0)
        helper.make_new_canvas(128, 128, feature_blending=1)
        opts = helper.default_brush_options()
        patch = stroke_patch_uint8(eng.patch_width)
        img, _, meta = helper.render_stroke(
            patch, None, opts, meta={"x": 16, "y": 16, "crop_margin": 4})
        assert img.shape == (24, 24, 4)
        assert meta == {"x": 20, "y": 20}


class TestLibraries:
    def test_seed_library(self):
        lib = SeedBrushLibrary([3, 1, 2], 16)
        assert lib.get_style_ids() == ["1", "2", "3"]
        opts = GanBrushOptions()
        lib.set_style("3", opts)
        want = np.random.RandomState(3).randn(1, 16)
        np.testing.assert_allclose(opts.style_z, want)

    def test_seed_interpolation(self):
        lib = SeedBrushLibrary([1, 2], 8)
        opts = GanBrushOptions()
        lib.set_interpolated_style("1", "2", 0.25, opts)
        z1 = np.random.RandomState(1).randn(1, 8)
        z2 = np.random.RandomState(2).randn(1, 8)
        np.testing.assert_allclose(opts.style_z, z1 * 0.25 + z2 * 0.75)

    def test_w_library_roundtrip(self, tmp_path):
        styles = {
            "a": np.random.RandomState(0).randn(1, 12, 16),
            "b": {"w": np.random.RandomState(1).randn(1, 12, 16),
                  "noise": {"b32.conv1.noise_const":
                            np.random.RandomState(2).randn(32, 32)}},
        }
        p = str(tmp_path / "lib.pkl")
        WBrushLibrary(styles).save(p)
        lib = BrushLibrary.from_file(p)
        assert isinstance(lib, WBrushLibrary)
        assert lib.get_style_ids() == ["a", "b"]
        opts = GanBrushOptions()
        lib.set_style("b", opts)
        assert opts.style_ws.shape == (1, 12, 16)
        assert "noise_buffers" in opts.custom_args

    def test_from_arg_rand(self):
        lib = BrushLibrary.from_arg("rand5", z_dim=8)
        assert isinstance(lib, RandomBrushLibrary)
        assert len(lib.get_style_ids()) == 5

    def test_from_arg_csv(self):
        lib = BrushLibrary.from_arg("5,6,7", z_dim=8)
        assert isinstance(lib, SeedBrushLibrary)
        assert lib.get_style_ids() == ["5", "6", "7"]

    def test_icon_store_survives_kill(self, tmp_path):
        """Every put() must leave a VALID zip on disk: a server killed
        mid-session never calls close(), and zipfile only writes the
        central directory there — without per-put persistence the whole
        icon cache is corrupt for every later run (observed in the r5
        brush-workflow evidence)."""
        from brushstroke_engine_tpu.engine.library import IconStore
        p = str(tmp_path / "icons.zip")
        store = IconStore(p)
        icon = np.full((8, 8, 3), 200, np.uint8)
        store.put("s1", icon)
        # Do NOT close: simulate a killed process by reopening from disk.
        fresh = IconStore(p)
        got = fresh.get("s1")
        assert got is not None and got.shape == (8, 8, 3)
        assert fresh.get("missing") is None

    def test_icon_store_recovers_corrupt_cache(self, tmp_path):
        from brushstroke_engine_tpu.engine.library import IconStore
        p = str(tmp_path / "icons.zip")
        with open(p, "wb") as f:
            f.write(b"PK\x03\x04 truncated-not-a-zip")
        store = IconStore(p)  # must recreate, not raise
        store.put("a", np.zeros((4, 4, 3), np.uint8))
        assert IconStore(p).get("a") is not None


class TestStylize:
    def test_crop_grid_covers(self):
        crops = generate_stitching_crops((128, 96), 32, 4)
        cov = np.zeros((128, 96), bool)
        for (y, x, h, w) in crops:
            assert 0 <= y <= 128 - 32 and 0 <= x <= 96 - 32
            cov[y:y + h, x:x + w] = True
        assert cov.all()

    def test_pad_geometry(self):
        g = np.ones((100, 70), np.float32)
        padded, stride = pad_geometry(g, 32, 4)
        assert padded.shape[0] >= 100 and padded.shape[1] >= 70
        assert (padded.shape[0] - 8) % stride == 0

    def test_stylize_small_image(self):
        eng = make_engine()
        helper = PaintingHelper(eng, style_seed=0)
        opts = helper.default_brush_options()
        geom = curated_geometry_patch("curve2", radius=9, width=64)
        out = stylize_image(helper, geom, opts, overlap_margin=4,
                            crop_margin=4, feature_blending_level=1)
        assert out.shape[-1] == 4
        assert out.dtype == np.uint8
        # Some stroke should have been rendered (nonzero alpha somewhere).
        assert out[..., 3].max() > 0


class TestCanvasSyncEdgeCases:
    def test_negative_coordinate_sync_offsets_patch(self):
        """Clipping a negative-start dirty area must offset into the patch,
        not write the patch's top-left corner (wire protocol allows
        negative x/y)."""
        eng = make_engine()
        pw = eng.patch_width
        helper = PaintingHelper(eng, style_seed=0)
        helper.make_new_canvas(64, 64, feature_blending=0)
        g = np.arange(pw * pw, dtype=np.float32).reshape(pw, pw) / (pw * pw)
        da = areas.make_area(-8, -8, pw, pw)
        helper._sync_geom_canvas(da, g, pw, pw)
        np.testing.assert_array_equal(
            helper.geom_canvas[:pw - 8, :pw - 8], g[8:, 8:])
        # Untouched region keeps the blank-canvas value.
        assert helper.geom_canvas[pw:, pw:].min() == 1.0

    def test_partial_patch_alignment_keeps_dirty_inside_gen(self):
        """The d-aligned gen window must cover the (ceil-aligned) dirty
        area: a floored-start-only window leaves a stale never-re-rendered
        sliver at the bottom/right."""
        eng = make_engine()
        pw = eng.patch_width
        helper = PaintingHelper(eng, style_seed=0)
        helper.make_new_canvas(128, 128, feature_blending=3)  # down factor 4
        d = helper.feature_canvas.down_factor
        assert d == 4
        for (y, x, h, w) in [(91, 91, 24, 24), (93, 93, 10, 10),
                             (1, 1, 24, 24), (101, 3, 16, 16),
                             (90, 90, 24, 24)]:
            geom = np.ones((h, w), np.float32)
            orig = areas.make_area(y, x, h, w)
            dirty, gen, patch = helper._expand_partial_patch(
                orig, geom, h, w)
            assert patch.shape == (1, pw, pw, 1)
            # gen: aligned, patch-sized, inside the canvas.
            assert gen.rstart % d == 0 and gen.cstart % d == 0
            assert gen.rows == pw and gen.cols == pw
            assert 0 <= gen.rstart and gen.rend <= 128
            assert 0 <= gen.cstart and gen.cend <= 128
            # dirty stays inside gen (no stale sliver) and still covers
            # the original dirty pixels.
            assert dirty.rstart >= gen.rstart and dirty.rend <= gen.rend
            assert dirty.cstart >= gen.cstart and dirty.cend <= gen.cend
            assert dirty.rstart <= orig.rstart and dirty.rend >= orig.rend
            assert dirty.cstart <= orig.cstart and dirty.cend >= orig.cend
