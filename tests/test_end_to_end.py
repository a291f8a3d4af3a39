"""End-to-end integration: short train -> snapshot -> paint engine ->
stylize + metrics.  The miniature analog of BASELINE config 5 ("neube_train
kimg=2 with geom warmstart + fid eval") on the CPU mesh."""

import json
import os

import numpy as np
import pytest

import jax

from brushstroke_engine_tpu.models.discriminator import DiscriminatorConfig
from brushstroke_engine_tpu.train.state import TrainConfig
from brushstroke_engine_tpu.train.loop import TrainingLoop
from brushstroke_engine_tpu.train.augment import AugmentConfig
from brushstroke_engine_tpu.train.dataset import (
    SyntheticGeometryDataset, BatchIterator,
)
from tests.helpers import small_bundle


class StyleIter:
    def __init__(self, res=32, batch=2):
        self.rng = np.random.RandomState(7)
        self.res = res
        self.batch = batch

    def __next__(self):
        # Structured "style" images: colored stripes (so FID has signal).
        img = np.zeros((self.batch, self.res, self.res, 3), np.uint8)
        for b in range(self.batch):
            c = self.rng.randint(0, 255, size=3)
            img[b, :, :, :] = c[None, None, :]
            img[b, :: 4] = 255 - c[None, None, :]
        return img


def test_full_cycle(tmp_path):
    b = small_bundle()
    cfg = TrainConfig(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=2,
        main_phase_losses="0.2*iou_inv(uvs)",
        geom_warmstart_kimg=4 / 1000.0,
        geom_warmstart_losses="1.0*iou_inv(uvs)+1.0*iou(u)",
        geom_interval=3, g_reg_interval=3, d_reg_interval=3,
        augment=AugmentConfig.from_spec("bgc"),
        kimg_per_tick=0)

    geo_ds = SyntheticGeometryDataset(48, size=6)
    geom_iter = BatchIterator(geo_ds, 2, seed=0)

    run_dir = str(tmp_path / "run")
    loop = TrainingLoop(cfg, b.enc_params, b.enc_state, StyleIter(),
                        geom_iter, run_dir=run_dir)
    # Warmstart phase active at start, then main phases.
    assert loop.in_warmstart()
    loop.run(total_kimg=10 / 1000.0)
    assert loop.cur_nimg >= 10

    # Stats logged with both warmstart and main phase losses.
    lines = [json.loads(l) for l in open(loop.stats_path)]
    keys = set().union(*[set(l) for l in lines])
    assert any("Ggeom-warm" in k for k in keys)
    assert "Loss/D/loss" in keys

    # Snapshot -> engine -> stylize a drawing.
    snaps = sorted(f for f in os.listdir(run_dir) if f.startswith("network"))
    assert snaps
    from brushstroke_engine_tpu.engine.brush import (
        PaintEngineFactory, GanBrushOptions,
    )
    from brushstroke_engine_tpu.engine.canvas import PaintingHelper
    from brushstroke_engine_tpu.engine.stylize import stylize_image
    from brushstroke_engine_tpu.data.curated_geometry import (
        curated_geometry_patch,
    )

    eng = PaintEngineFactory.create(os.path.join(run_dir, snaps[-1]))
    helper = PaintingHelper(eng, style_seed=0)
    opts = helper.default_brush_options()
    geom = curated_geometry_patch("curve2", 9, 96)
    out = stylize_image(helper, geom, opts, overlap_margin=4, crop_margin=4,
                        feature_blending_level=1, on_white=True)
    assert out.dtype == np.uint8 and out.shape[-1] == 4

    # FID between training style images and engine renders runs end to end.
    from brushstroke_engine_tpu.metrics.stroke_generator import (
        PaintStrokeGenerator, RandomState,
    )
    from brushstroke_engine_tpu.metrics.metric_main import forger_compute_fid

    gen = PaintStrokeGenerator(2, eng, RandomState(0))

    def tri_iter():
        i = 0
        while True:
            yield np.stack([geo_ds[i % 6], geo_ds[(i + 1) % 6]])
            i += 1

    gen.set_geometry_source_from_iterator(tri_iter(), 2)
    si = StyleIter()
    fid = forger_compute_fid(gen, [next(si) for _ in range(4)], num_items=8)
    assert np.isfinite(fid) and fid >= 0
