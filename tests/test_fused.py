"""Tests for the fused single-dispatch training step."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import small_bundle
from brushstroke_engine_tpu.train.state import TrainConfig, init_train_state
from brushstroke_engine_tpu.train.fused import make_fused_train_step
from brushstroke_engine_tpu.train.augment import AugmentConfig
from brushstroke_engine_tpu.models.discriminator import DiscriminatorConfig


def make_cfg(b):
    return TrainConfig(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=2,
        main_phase_losses="0.1*iou_inv(uvs)",
        geom_interval=3, g_reg_interval=2, d_reg_interval=2,
        geom_warmstart_kimg=1,
        augment=AugmentConfig.from_spec("bgc"))


def test_fused_step_phase_selection():
    b = small_bundle()
    cfg = make_cfg(b)
    state = init_train_state(cfg, jax.random.PRNGKey(0),
                             g_params=b.gen_params, g_state=b.gen_state)
    step = make_fused_train_step(cfg)
    rng0 = np.random.RandomState(0)
    real = jnp.asarray(rng0.randn(2, 32, 32, 3), jnp.float32)
    geom = jnp.asarray((rng0.rand(2, 32, 32, 1) > 0.5), jnp.float32)

    state, stats = step(state, b.enc_params, b.enc_state, real, geom, geom,
                        jax.random.PRNGKey(1), jnp.int32(0),
                        jnp.bool_(True), jnp.float32(0.99))
    ran = {k for k, v in stats.items() if np.isfinite(float(v))}
    assert any("Ggeom-warm" in k for k in ran)
    assert "Loss/D/loss" not in ran

    state, stats = step(state, b.enc_params, b.enc_state, real, geom, geom,
                        jax.random.PRNGKey(2), jnp.int32(6),
                        jnp.bool_(False), jnp.float32(0.99))
    ran = {k for k, v in stats.items() if np.isfinite(float(v))}
    assert "Loss/D/loss" in ran
    assert "Loss/r1_penalty" in ran          # 6 % 2 == 0
    assert "Loss/pl_penalty" in ran          # 6 % 2 == 0
    assert any(k.startswith("Loss/forger/Ggeom/") for k in ran)  # 6 % 3 == 0

    state, stats = step(state, b.enc_params, b.enc_state, real, geom, geom,
                        jax.random.PRNGKey(3), jnp.int32(1),
                        jnp.bool_(False), jnp.float32(0.99))
    ran = {k for k, v in stats.items() if np.isfinite(float(v))}
    assert "Loss/r1_penalty" not in ran
    assert not any(k.startswith("Loss/forger/Ggeom/") for k in ran)


def test_fused_updates_params():
    b = small_bundle()
    cfg = make_cfg(b)
    state = init_train_state(cfg, jax.random.PRNGKey(0),
                             g_params=b.gen_params, g_state=b.gen_state)
    step = make_fused_train_step(cfg)
    before = np.asarray(
        jax.tree_util.tree_leaves(state["g_params"])[0]).copy()
    rng0 = np.random.RandomState(1)
    real = jnp.asarray(rng0.randn(2, 32, 32, 3), jnp.float32)
    geom = jnp.asarray((rng0.rand(2, 32, 32, 1) > 0.5), jnp.float32)
    state, _ = step(state, b.enc_params, b.enc_state, real, geom, geom,
                    jax.random.PRNGKey(4), jnp.int32(2), jnp.bool_(False),
                    jnp.float32(0.99))
    after = np.asarray(jax.tree_util.tree_leaves(state["g_params"])[0])
    assert not np.allclose(before, after)


def test_fused_step_with_stitching():
    """Gstitch runs inside the fused dispatch on its interval (no separate
    stitch dispatch), with the double-crop data path."""
    b = small_bundle()
    cfg = TrainConfig(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=2,
        main_phase_losses="0.1*iou_inv(uvs)",
        stitch_interval=2,
        stitch_phase_losses="1*gan(fake_composite)+0.5*l1(fake_composite)",
        g_reg_interval=2, d_reg_interval=2)
    state = init_train_state(cfg, jax.random.PRNGKey(0),
                             g_params=b.gen_params, g_state=b.gen_state)
    step = make_fused_train_step(cfg)
    rng0 = np.random.RandomState(0)
    real = jnp.asarray(rng0.randn(2, 32, 32, 3), jnp.float32)
    geom = jnp.asarray((rng0.rand(2, 32, 32, 1) > 0.5), jnp.float32)
    geom2 = jnp.asarray((rng0.rand(2, 32, 32, 1) > 0.5), jnp.float32)
    crop1 = jnp.asarray((0, 0, 32, 32))
    crop2 = jnp.asarray((10, 6, 32, 32))

    # batch_idx=2: stitch interval hits.
    state, stats = step(state, b.enc_params, b.enc_state, real, geom, geom,
                        jax.random.PRNGKey(1), jnp.int32(2),
                        jnp.bool_(False), jnp.float32(0.99),
                        geom_input2=geom2, crop1=crop1, crop2=crop2)
    ran = {k for k, v in stats.items() if np.isfinite(float(v))}
    assert "Loss/forger/Gstitch/total" in ran
    assert "Loss/D/loss" in ran

    # batch_idx=1: stitch interval misses -> NaN stats, same program.
    state, stats = step(state, b.enc_params, b.enc_state, real, geom, geom,
                        jax.random.PRNGKey(2), jnp.int32(1),
                        jnp.bool_(False), jnp.float32(0.99),
                        geom_input2=geom2, crop1=crop1, crop2=crop2)
    ran = {k for k, v in stats.items() if np.isfinite(float(v))}
    assert "Loss/forger/Gstitch/total" not in ran
    assert "Loss/forger/Gstitch/total" in stats  # key present, NaN


def test_fused_stitch_requires_data():
    b = small_bundle()
    cfg = TrainConfig(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=2,
        main_phase_losses="0.1*iou_inv(uvs)",
        stitch_interval=2,
        stitch_phase_losses="1*gan(fake_composite)")
    state = init_train_state(cfg, jax.random.PRNGKey(0),
                             g_params=b.gen_params, g_state=b.gen_state)
    step = make_fused_train_step(cfg)
    rng0 = np.random.RandomState(0)
    real = jnp.asarray(rng0.randn(2, 32, 32, 3), jnp.float32)
    geom = jnp.asarray((rng0.rand(2, 32, 32, 1) > 0.5), jnp.float32)
    with pytest.raises(AssertionError, match="stitching is configured"):
        step(state, b.enc_params, b.enc_state, real, geom, geom,
             jax.random.PRNGKey(1), jnp.int32(0), jnp.bool_(False),
             jnp.float32(0.99))


def test_fused_loop_with_stitching(tmp_path):
    """The training loop with --fused + stitching is ONE dispatch per batch:
    Gstitch stats appear on its interval without a separate stitch step."""
    from brushstroke_engine_tpu.train.loop import TrainingLoop
    from brushstroke_engine_tpu.train.dataset import SyntheticGeometryDataset

    b = small_bundle()
    cfg = TrainConfig(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=2,
        main_phase_losses="0.1*iou_inv(uvs)",
        stitch_interval=2,
        stitch_phase_losses="1*gan(fake_composite)",
        geom_warmstart_kimg=0, g_reg_interval=2, d_reg_interval=2,
        kimg_per_tick=0)

    class StyleIter:
        def __next__(self):
            return (np.random.RandomState(0).rand(2, 32, 32, 3)
                    * 255).astype(np.uint8)

    geo_ds = SyntheticGeometryDataset(48, size=4)

    class GeomIter:
        def __init__(self):
            self.i = 0

        def __next__(self):
            self.i += 1
            return np.stack([geo_ds[self.i % 4], geo_ds[(self.i + 1) % 4]])

    loop = TrainingLoop(cfg, b.enc_params, b.enc_state, StyleIter(),
                        GeomIter(), run_dir=str(tmp_path), use_fused=True)
    assert loop.fused_step is not None and loop.stitch_step is not None
    loop.run(total_kimg=4 / 1000.0)
    assert loop.cur_nimg >= 4
    lines = [json.loads(ln) for ln in open(loop.stats_path)]
    stitch_vals = [ln.get("Loss/forger/Gstitch/total") for ln in lines]
    assert any(v is not None and np.isfinite(v) for v in stitch_vals)


def test_fused_warmstart_fake_orig():
    """Clarity-finetune inside the fused step: warmstart losses anchored to
    the FROZEN original generator (reference finetune_flags.txt +
    training_loop_modified.py:260-262,479).  The fake_orig target must be
    the orig params' output: stepping twice with the SAME g_orig_params
    keeps the anchor fixed even as g_params moves."""
    b = small_bundle()
    cfg = TrainConfig(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=2,
        geom_warmstart_kimg=1, noise_mode="const",
        geom_warmstart_losses="0.5*iou_inv(uvs)+0.5*l1(fake_orig)")
    state = init_train_state(cfg, jax.random.PRNGKey(0),
                             g_params=b.gen_params, g_state=b.gen_state)
    g_orig = jax.tree_util.tree_map(jnp.array, state["g_params"])
    step = make_fused_train_step(cfg)
    rng0 = np.random.RandomState(0)
    real = jnp.asarray(rng0.randn(2, 32, 32, 3), jnp.float32)
    geom = jnp.asarray((rng0.rand(2, 32, 32, 1) > 0.5), jnp.float32)

    state, stats = step(state, b.enc_params, b.enc_state, real, geom, geom,
                        jax.random.PRNGKey(1), jnp.int32(0),
                        jnp.bool_(True), jnp.float32(0.99),
                        g_orig_params=g_orig)
    ran = {k for k, v in stats.items() if np.isfinite(float(v))}
    assert "Loss/forger/Ggeom-warm/l1_fake_orig" in ran
    # Step 1 compares G(z) to G_orig(z) on IDENTICAL params + rng -> ~0.
    assert float(stats["Loss/forger/Ggeom-warm/l1_fake_orig"]) < 1e-5

    state, stats = step(state, b.enc_params, b.enc_state, real, geom, geom,
                        jax.random.PRNGKey(1), jnp.int32(1),
                        jnp.bool_(True), jnp.float32(0.99),
                        g_orig_params=g_orig)
    # After one update g_params != g_orig -> anchored loss is now nonzero.
    assert float(stats["Loss/forger/Ggeom-warm/l1_fake_orig"]) > 0


def test_fused_fake_orig_requires_params():
    """Configured fake_orig losses without g_orig_params must fail loudly."""
    b = small_bundle()
    cfg = TrainConfig(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=2,
        geom_warmstart_kimg=1,
        geom_warmstart_losses="0.5*l1(fake_orig)")
    state = init_train_state(cfg, jax.random.PRNGKey(0),
                             g_params=b.gen_params, g_state=b.gen_state)
    step = make_fused_train_step(cfg)
    rng0 = np.random.RandomState(0)
    real = jnp.asarray(rng0.randn(2, 32, 32, 3), jnp.float32)
    geom = jnp.asarray((rng0.rand(2, 32, 32, 1) > 0.5), jnp.float32)
    with pytest.raises(AssertionError):
        step(state, b.enc_params, b.enc_state, real, geom, geom,
             jax.random.PRNGKey(1), jnp.int32(0), jnp.bool_(True),
             jnp.float32(0.99))
