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
