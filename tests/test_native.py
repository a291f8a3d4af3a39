"""Tests for the native C++ data kernels vs the numpy reference."""

import numpy as np
import pytest

from brushstroke_engine_tpu import native
from brushstroke_engine_tpu.data import curves


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return native.get_lib()


class TestNative:
    def test_builds_and_loads(self, lib):
        assert lib is not None

    def test_draw_stroke_matches_numpy(self, lib):
        rng = np.random.default_rng(0)
        pts = rng.uniform(5, 59, size=(12, 2))
        got = native.draw_stroke_native(64, pts.astype(np.float32), 4.0)
        # numpy reference path (bypass the native dispatch).
        ys, xs = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        grid = np.stack([ys.ravel(), xs.ravel()], axis=1).astype(np.float64)
        dist = curves._dist_to_segments(grid, pts.astype(np.float64))
        want = np.clip((dist - 4.0) / 1.0, 0, 1).reshape(64, 64)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_gaussian_blur_matches_numpy(self, lib):
        rng = np.random.default_rng(1)
        img = rng.random((32, 32)).astype(np.float32)
        got = native.gaussian_blur_native(img, 2.0)
        want = curves._gaussian_blur2d(img, 2.0)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_triband_channels(self, lib):
        rng = np.random.default_rng(2)
        gray = rng.random((32, 32)).astype(np.float32)
        tri = native.triband_native(gray, blur_sigma=2.0, threshold=0.5)
        assert tri.shape == (32, 32, 3)
        assert tri.dtype == np.uint8
        np.testing.assert_allclose(tri[..., 0],
                                   np.clip(gray * 255, 0, 255).astype(
                                       np.uint8), atol=1)
        binary = (gray > 0.5).astype(np.float32) * 255
        np.testing.assert_array_equal(tri[..., 1], binary.astype(np.uint8))

    def test_draw_stroke_used_by_curves(self, lib):
        # The public draw_stroke should route through the native path and
        # produce identical results to a direct native call.
        pts = np.asarray([[10.0, 10.0], [50.0, 50.0]])
        via_public = curves.draw_stroke(64, pts, 3.0)
        via_native = native.draw_stroke_native(64, pts.astype(np.float32),
                                               3.0)
        np.testing.assert_allclose(via_public, via_native)

    def test_speedup_sanity(self, lib):
        import time
        rng = np.random.default_rng(3)
        pts = rng.uniform(10, 240, size=(120, 2)).astype(np.float32)
        t0 = time.perf_counter()
        for _ in range(3):
            native.draw_stroke_native(256, pts, 5.0)
        t_native = time.perf_counter() - t0
        assert t_native < 3.0  # native path is fast enough for data gen
