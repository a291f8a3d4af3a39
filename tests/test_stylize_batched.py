"""Tests for the batched checkerboard-wave canvas renderer."""

import numpy as np
import pytest

from brushstroke_engine_tpu.engine.brush import GanBrushOptions
from brushstroke_engine_tpu.engine.canvas import PaintingHelper
from brushstroke_engine_tpu.engine.stylize import (
    stylize_image, stylize_image_batched, stylize_image_ondevice,
)
from brushstroke_engine_tpu.data.curves import random_spline_stroke
from tests.helpers import make_engine


def make_geom(width=96, seed=0):
    rng = np.random.default_rng(seed)
    return random_spline_stroke(rng, width, radius=4.0)


class TestBatchedStylize:
    def test_no_blending_matches_shape(self):
        eng = make_engine()
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(1), 1)
        geom = make_geom()
        out = stylize_image_batched(eng, geom, opts, overlap_margin=4,
                                    crop_margin=4,
                                    feature_blending_level=0,
                                    batch_size=4)
        assert out.dtype == np.uint8 and out.shape[-1] == 4
        assert out[..., 3].max() > 0

    def test_with_blending_runs(self):
        eng = make_engine()
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(2), 2)
        geom = make_geom(seed=1)
        out = stylize_image_batched(eng, geom, opts, overlap_margin=4,
                                    crop_margin=4,
                                    feature_blending_level=1,
                                    batch_size=4)
        assert out[..., 3].max() > 0

    def test_batched_close_to_sequential_without_blending(self):
        """Without feature blending each tile is independent, so batched
        waves must match the sequential helper path exactly where tiles are
        written (same positions -> same noise)."""
        eng = make_engine()
        geom = make_geom(seed=2)

        opts1 = GanBrushOptions()
        opts1.set_style(eng.random_style(3), 3)
        helper = PaintingHelper(eng, style_seed=0)
        seq = stylize_image(helper, geom, opts1, overlap_margin=4,
                            crop_margin=4, feature_blending_level=0)

        opts2 = GanBrushOptions()
        opts2.set_style(eng.random_style(3), 3)
        bat = stylize_image_batched(eng, geom, opts2, overlap_margin=4,
                                    crop_margin=4,
                                    feature_blending_level=0, batch_size=4)
        assert seq.shape == bat.shape
        # Interior pixels match closely (uint8 rounding tolerance).
        diff = np.abs(seq.astype(int) - bat.astype(int))
        assert np.median(diff) <= 1
        assert (diff <= 2).mean() > 0.95

    def test_color_override_in_batched_path(self):
        eng = make_engine()
        eng.set_render_mode("full")
        geom = make_geom(seed=3)
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(4), 4)
        base = stylize_image_batched(eng, geom, opts, overlap_margin=4,
                                     crop_margin=4,
                                     feature_blending_level=0, batch_size=4)
        opts.set_color(0, np.asarray([255, 0, 0], np.uint8))
        red = stylize_image_batched(eng, geom, opts, overlap_margin=4,
                                    crop_margin=4,
                                    feature_blending_level=0, batch_size=4)
        assert not np.array_equal(base, red)


class TestOndeviceStylize:
    """The single-dispatch scan renderer must agree with the host-loop wave
    renderer (same wave decomposition, same math, different orchestration)."""

    @pytest.mark.parametrize("level", [0, 1])
    def test_matches_host_waves(self, level):
        eng = make_engine()
        geom = make_geom(seed=5)

        opts1 = GanBrushOptions()
        opts1.set_style(eng.random_style(7), 7)
        host = stylize_image_batched(eng, geom, opts1, overlap_margin=4,
                                     crop_margin=4,
                                     feature_blending_level=level,
                                     batch_size=4)
        opts2 = GanBrushOptions()
        opts2.set_style(eng.random_style(7), 7)
        dev = stylize_image_ondevice(eng, geom, opts2, overlap_margin=4,
                                     crop_margin=4,
                                     feature_blending_level=level,
                                     batch_size=4)
        assert host.shape == dev.shape
        diff = np.abs(host.astype(int) - dev.astype(int))
        assert np.median(diff) <= 1
        assert (diff <= 2).mean() > 0.95

    def test_color_override_and_nonempty_mode(self):
        eng = make_engine()
        eng.set_render_mode("full")
        geom = make_geom(seed=6)
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(8), 8)
        opts.set_color(0, np.asarray([0, 255, 0], np.uint8))
        out = stylize_image_ondevice(eng, geom, opts, overlap_margin=4,
                                     crop_margin=4,
                                     feature_blending_level=1,
                                     batch_size=4, mode="nonempty")
        assert out.dtype == np.uint8 and out[..., 3].max() > 0

    def test_empty_geometry(self):
        eng = make_engine()
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(9), 9)
        geom = np.ones((64, 64), np.float32)   # all background
        out = stylize_image_ondevice(eng, geom, opts, overlap_margin=4,
                                     crop_margin=4,
                                     feature_blending_level=1,
                                     batch_size=4, mode="nonempty")
        assert out[..., 3].max() == 0
