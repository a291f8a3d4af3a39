"""Standalone geometry-autoencoder training.

Rebuild of the reference AE trainer (forger/train/train_stroke_autoencoder.py):
multi-width random crops of triband geometry (G channel = input, B channel =
truth), BCE-with-logits loss with optional FG/BG-balanced weighting, eval
loop, and checkpointing.  The optimization step (forward, BN batch stats,
loss, Adam) is one jitted function.
"""

from __future__ import annotations

import logging
import os
import pickle
from dataclasses import dataclass
from functools import partial
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from brushstroke_engine_tpu.models.geo_encoder import (
    GeoEncoderConfig, geo_encoder_init, geo_encoder_apply, preprocess,
    preprocess_truth,
)

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class AETrainConfig:
    enc_cfg: GeoEncoderConfig = GeoEncoderConfig(preproc="-11inverse")
    batch_size: int = 16
    learning_rate: float = 1e-3
    num_steps: int = 10000
    widths: tuple = (128,)            # random crop widths (multi-scale)
    balanced_bce: bool = True         # FG/BG-balanced loss weighting
    eval_every: int = 500
    checkpoint_every: int = 1000


def bce_with_logits(logits, targets, weights=None):
    loss = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weights is not None:
        return jnp.sum(loss * weights) / jnp.clip(jnp.sum(weights), 1, None)
    return jnp.mean(loss)


def make_ae_train_step(cfg: AETrainConfig):
    opt = optax.adam(cfg.learning_rate)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, state, opt_state, geom_input, geom_truth):
        """geom_input/truth: [B, W, W, 1] float [0,1] (1 = BG)."""

        def loss_fn(params):
            x = preprocess(cfg.enc_cfg, geom_input)
            logits, new_state = geo_encoder_apply(
                cfg.enc_cfg, params, state, x, train=True,
                preprocess_input=False)
            target = preprocess_truth(cfg.enc_cfg, geom_truth)
            if cfg.enc_cfg.out_channels == 1:
                # Bias-centered sigmoid output (reference base.py:77).
                logits_used = logits + 0.5
                weights = None
                if cfg.balanced_bce:
                    fg = (target < 0.5).astype(jnp.float32)
                    n_fg = jnp.clip(jnp.sum(fg), 1, None)
                    n_bg = jnp.clip(jnp.sum(1 - fg), 1, None)
                    weights = fg / n_fg + (1 - fg) / n_bg
                loss = bce_with_logits(logits_used, target, weights)
            else:
                # 3-channel decoder: softmax FG/FG/BG (reference base.py:84).
                labels = (target > 0.5).astype(jnp.int32)[..., 0] * 2
                loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels))
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    return step, opt


def random_crop_batch(tri_batch: np.ndarray, width: int,
                      rng: np.random.Generator):
    """Random same-size crops (multi-width handled by caller)."""
    h, w = tri_batch.shape[1:3]
    y = int(rng.integers(0, max(h - width, 0) + 1))
    x = int(rng.integers(0, max(w - width, 0) + 1))
    return tri_batch[:, y:y + width, x:x + width]


def train_autoencoder(cfg: AETrainConfig, tri_iterator: Iterator,
                      run_dir: str, seed: int = 0,
                      resume: Optional[str] = None):
    """Train the geometry AE on triband batches (uint8 [B, H, W, 3])."""
    os.makedirs(run_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    params, state = geo_encoder_init(cfg.enc_cfg, key)
    step_fn, opt = make_ae_train_step(cfg)
    opt_state = opt.init(params)
    start_step = 0
    if resume is not None and os.path.isfile(resume):
        with open(resume, "rb") as f:
            saved = pickle.load(f)
        params, state = saved["params"], saved["state"]
        start_step = saved.get("step", 0)
        logger.info("Resumed AE from %s at step %d", resume, start_step)

    rng = np.random.default_rng(seed)
    loss = None
    for step in range(start_step, cfg.num_steps):
        tri = np.asarray(next(tri_iterator), np.float32) / 255.0
        width = int(rng.choice(cfg.widths))
        tri = random_crop_batch(tri, width, rng)
        geom_input = jnp.asarray(tri[..., 1:2])
        geom_truth = jnp.asarray(tri[..., 2:3])
        params, state, opt_state, loss = step_fn(
            params, state, opt_state, geom_input, geom_truth)
        if step % cfg.eval_every == 0:
            logger.info("AE step %d: loss %.4f", step, float(loss))
        if step % cfg.checkpoint_every == 0 or step == cfg.num_steps - 1:
            save_ae_checkpoint(os.path.join(run_dir, "ae_latest.pkl"),
                               cfg.enc_cfg, params, state, step)
    return params, state


def save_ae_checkpoint(path: str, enc_cfg: GeoEncoderConfig, params, state,
                       step: int = 0):
    import dataclasses
    with open(path, "wb") as f:
        pickle.dump({
            "magic": "brushstroke_engine_tpu.geo_encoder.v1",
            "args": dataclasses.asdict(enc_cfg),
            "params": jax.tree_util.tree_map(np.asarray, params),
            "state": jax.tree_util.tree_map(np.asarray, state),
            "step": step,
        }, f)


def load_ae_checkpoint(path: str):
    with open(path, "rb") as f:
        saved = pickle.load(f)
    args = dict(saved["args"])
    for k in ("down_filters", "post_filters", "up_filters"):
        if k in args and args[k] is not None:
            args[k] = tuple(args[k])
    return (GeoEncoderConfig(**args), saved["params"], saved["state"])
