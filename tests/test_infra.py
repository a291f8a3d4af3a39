"""Tests for runtime infra: stats collector, util, eval hooks integration."""

import logging
import os

import numpy as np
import pytest

import jax.numpy as jnp

from brushstroke_engine_tpu.utils.stats import Collector, report_moments
from brushstroke_engine_tpu.utils.util import (
    EasyDict, construct_class_by_name, format_time, Timer, log_tensor,
)


class TestStats:
    def test_report_moments_device(self):
        m = np.asarray(report_moments(jnp.asarray([1.0, 2.0, 3.0])))
        np.testing.assert_allclose(m, [3.0, 6.0, 14.0])

    def test_collector_mean_std(self):
        c = Collector()
        c.report("Loss/a", np.asarray([1.0, 2.0, 3.0]))
        c.report("Loss/a", 4.0)
        assert c.num("Loss/a") == 4
        np.testing.assert_allclose(c.mean("Loss/a"), 2.5)
        assert c.std("Loss/a") > 0
        assert c["Loss/a"] == c.mean("Loss/a")

    def test_collector_regex(self):
        c = Collector(regex=r"Loss/.*")
        c.report("Loss/x", 1.0)
        c.report("Timing/x", 1.0)
        assert c.names() == ["Loss/x"]

    def test_collector_accepts_moments(self):
        c = Collector()
        c.report_raw_moments(
            "m", np.asarray(report_moments(jnp.asarray([2.0, 4.0]))))
        assert c.num("m") == 2
        np.testing.assert_allclose(c.mean("m"), 3.0)


class TestUtil:
    def test_easydict(self):
        d = EasyDict(a=1)
        d.b = 2
        assert d.a == 1 and d["b"] == 2
        del d.a
        with pytest.raises(AttributeError):
            _ = d.a

    def test_construct_class_by_name(self):
        od = construct_class_by_name(
            [("a", 1)], class_name="collections.OrderedDict")
        assert od["a"] == 1

    def test_format_time(self):
        assert format_time(5) == "5s"
        assert format_time(65) == "1m 05s"
        assert format_time(3700) == "1h 01m"

    def test_timer(self):
        t = Timer()
        assert t.peek() >= 0
        assert t.tick() >= 0

    def test_log_tensor(self, caplog):
        logger = logging.getLogger("t")
        with caplog.at_level(logging.DEBUG, "t"):
            log_tensor(np.ones((2, 3)), "x", logger, print_stats=True)
        assert "shape (2, 3)" in caplog.text

    def test_assert_shape(self):
        from brushstroke_engine_tpu.utils.util import assert_shape
        assert_shape(np.zeros((2, 3, 4)), (2, None, 4))
        with pytest.raises(AssertionError):
            assert_shape(np.zeros((2, 3)), (2, 4))
        with pytest.raises(AssertionError):
            assert_shape(np.zeros((2, 3)), (2, 3, 1))

    def test_profiled_function(self):
        from brushstroke_engine_tpu.utils.util import profiled_function
        import jax.numpy as jnp

        @profiled_function
        def f(x):
            return x * 2

        assert float(f(jnp.float32(3.0))) == 6.0
        assert f.__name__ == "f"

    def test_open_url(self, tmp_path):
        from brushstroke_engine_tpu.utils.util import open_url
        p = tmp_path / "a.bin"
        p.write_bytes(b"hi")
        with open_url(str(p)) as f:
            assert f.read() == b"hi"
        with open_url(f"file://{p}") as f:
            assert f.read() == b"hi"
        with pytest.raises(FileNotFoundError):
            open_url("https://example.com/model.pt",
                     cache_dir=str(tmp_path))
        # Pre-populated cache hit.
        import hashlib
        digest = hashlib.sha256(
            b"https://example.com/model.pt").hexdigest()[:16]
        (tmp_path / f"{digest}-model.pt").write_bytes(b"weights")
        with open_url("https://example.com/model.pt",
                      cache_dir=str(tmp_path)) as f:
            assert f.read() == b"weights"


class TestEvalHooks:
    def test_hooks_run_in_loop(self, tmp_path):
        from tests.helpers import small_bundle
        from brushstroke_engine_tpu.models.discriminator import (
            DiscriminatorConfig,
        )
        from brushstroke_engine_tpu.train.state import TrainConfig
        from brushstroke_engine_tpu.train.loop import TrainingLoop
        from brushstroke_engine_tpu.train.eval_hooks import make_eval_hooks
        from brushstroke_engine_tpu.train.dataset import (
            SyntheticGeometryDataset,
        )

        b = small_bundle()
        cfg = TrainConfig(
            gen_cfg=b.gen_cfg,
            disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                         img_channels=3, channel_base=2048,
                                         channel_max=32),
            enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=2,
            geom_warmstart_kimg=0, g_reg_interval=0, d_reg_interval=0,
            geom_interval=0, kimg_per_tick=0)

        class StyleIter:
            def __next__(self):
                return (np.random.RandomState(0).rand(2, 32, 32, 3)
                        * 255).astype(np.uint8)

        ds = SyntheticGeometryDataset(40, size=4)

        class GeomIter:
            def __init__(self):
                self.i = 0

            def __next__(self):
                self.i += 1
                return np.stack([ds[self.i % 4], ds[(self.i + 1) % 4]])

        hooks = make_eval_hooks(image_snapshot_ticks=1,
                                metric_snapshot_ticks=1,
                                num_metric_styles=1, metric_batch_size=2)
        loop = TrainingLoop(cfg, b.enc_params, b.enc_state, StyleIter(),
                            GeomIter(), run_dir=str(tmp_path), hooks=hooks)
        loop.run(total_kimg=4 / 1000.0)
        viz_files = os.listdir(tmp_path / "viz") \
            if (tmp_path / "viz").exists() else []
        assert len(viz_files) >= 1
        assert (tmp_path / "summary_metrics.txt").exists()
