"""Project a real (style image, geometry) pair into W/W+ + per-layer noise.

Rebuild of the reference projection (scripts/project_main.py:38-230): Adam on
``w_opt`` (+ noise textures) against an LPIPS target, with optional L1 over
conservative-foreground pixels and a background-clarity term, a multiscale
noise autocorrelation regularizer, cosine LR ramp-up/down, per-step noise
renormalization, and early stop on LPIPS plateau.

TPU-first: the whole optimization step (synthesis forward, losses, grads,
Adam update, noise renorm) is ONE jitted function; the host loop only feeds
the step index and checks the plateau condition every 100 steps.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from brushstroke_engine_tpu.models.generator import generator_apply
from brushstroke_engine_tpu.metrics.lpips import lpips_batched
from brushstroke_engine_tpu.metrics.geom import get_conservative_fg_bg
from brushstroke_engine_tpu.tools.latent import get_w_stats

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class ProjectionConfig:
    num_steps: int = 1000
    w_avg_samples: int = 10000
    initial_learning_rate: float = 0.1
    initial_noise_factor: float = 0.05
    lr_rampdown_length: float = 0.25
    lr_rampup_length: float = 0.05
    noise_ramp_length: float = 0.75
    regularize_noise_weight: float = 10.0
    l1_fg_weight: float = 0.0
    bg_weight: float = 0.0
    w_plus: bool = True
    optimize_noise: bool = True
    with_composite: bool = False
    min_lpips_improvement: float = 1e-4


def _lr_schedule(cfg: ProjectionConfig, step):
    t = step / cfg.num_steps
    ramp = jnp.minimum(1.0, (1.0 - t) / cfg.lr_rampdown_length)
    ramp = 0.5 - 0.5 * jnp.cos(ramp * math.pi)
    ramp = ramp * jnp.minimum(1.0, t / cfg.lr_rampup_length)
    return cfg.initial_learning_rate * ramp


def _noise_autocorr_reg(noise_bufs: Dict):
    """Multiscale autocorrelation penalty (project_main.py:172-181)."""
    total = 0.0
    for v in noise_bufs.values():
        noise = v[None, None, :, :].astype(jnp.float32)
        while True:
            total = total + jnp.mean(
                noise * jnp.roll(noise, 1, axis=3)) ** 2
            total = total + jnp.mean(
                noise * jnp.roll(noise, 1, axis=2)) ** 2
            if noise.shape[2] <= 8:
                break
            noise = jax.lax.reduce_window(
                noise, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID") / 4.0
    return total


def compute_masked_color(target, mask):
    """Mean color over masked pixels -> [B, 1, 1, 3] (background estimate)."""
    m = mask.astype(jnp.float32)
    num = jnp.sum(target * m, axis=(1, 2), keepdims=True)
    den = jnp.clip(jnp.sum(m, axis=(1, 2), keepdims=True), 1, None)
    return num / den


def composite_with_bg_color(debug, bg_color):
    """Compose uvs x colors over an estimated background color, in [-1, 1]
    (project_main.py composite_with_bg_color)."""
    uvs = debug["uvs"]
    colors = (debug["colors"] + 1.0) / 2.0
    stroke = jnp.einsum("bhwk,bck->bhwc", uvs[..., :2],
                        colors[..., :2])
    alpha = jnp.sum(uvs[..., :2], axis=-1, keepdims=True)
    out = stroke + (1 - alpha) * bg_color
    return out * 2.0 - 1.0


def project(engine, target, geom, cfg: ProjectionConfig = ProjectionConfig(),
            resume_from: Optional[Dict] = None, seed: int = 0,
            log_every: int = 100) -> Dict:
    """Optimize a style for (target, geom) patches.

    Args:
      engine: a GanPaintEngine (gen params/state + encoder).
      target: [B, W, W, 3] float images in [-1, 1].
      geom: [B, W, W, 1] float geometry, 0 = FG.

    Returns dict {'w': [1, num_ws, w_dim], 'noise': {...}, 'bg': [3],
    'step': int, 'lpips': float}.
    """
    from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode

    gen_cfg = engine.gen_cfg
    target = jnp.asarray(target, jnp.float32)
    geom = jnp.asarray(geom, jnp.float32)
    geom_feats = geo_encoder_encode(engine.enc_cfg, engine.enc_params,
                                    engine.enc_state, geom,
                                    res=list(engine.enc_res))
    fg, bg = get_conservative_fg_bg(geom)
    bg_color = compute_masked_color(target, bg)

    w_avg, w_std = get_w_stats(gen_cfg, engine.gen_params["mapping"],
                               num_samples=cfg.w_avg_samples, seed=seed)
    num_ws = gen_cfg.num_ws
    if cfg.w_plus:
        w_start = np.tile(w_avg, (1, num_ws, 1))
    else:
        w_start = w_avg
    if resume_from is not None and "w" in resume_from:
        w_prev = np.asarray(resume_from["w"], np.float32)
        if w_prev.shape == w_start.shape:
            w_start = w_prev
        else:
            w_start = np.tile(w_prev.reshape(1, 1, -1), (1, num_ws, 1))

    rng = np.random.RandomState(seed)
    noise_bufs = {}
    if cfg.optimize_noise:
        for k, v in engine.gen_state["noise"].items():
            if resume_from is not None and "noise" in resume_from and \
                    k in resume_from["noise"]:
                noise_bufs[k] = jnp.asarray(resume_from["noise"][k],
                                            jnp.float32)
            else:
                noise_bufs[k] = jnp.asarray(
                    rng.randn(*np.asarray(v).shape), jnp.float32)

    params = {"w": jnp.asarray(w_start, jnp.float32), "noise": noise_bufs}
    opt = optax.adam(learning_rate=1.0, b1=0.9, b2=0.999)  # lr via scale
    opt_state = opt.init(params)

    g_state = {"w_avg": engine.gen_state.get("w_avg"),
               "noise": engine.gen_state["noise"]}

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, step, key):
        t = step / cfg.num_steps
        w_noise_scale = w_std * cfg.initial_noise_factor * \
            jnp.maximum(0.0, 1.0 - t / cfg.noise_ramp_length) ** 2
        lr = _lr_schedule(cfg, step)

        def loss_fn(params):
            w_noise = jax.random.normal(key, params["w"].shape) * \
                w_noise_scale
            ws = params["w"] + w_noise
            if not cfg.w_plus:
                ws = jnp.tile(ws, (1, num_ws, 1))
            ws = jnp.tile(ws, (target.shape[0], 1, 1))
            img, debug, _ = generator_apply(
                gen_cfg, engine.gen_params, g_state, ws=ws,
                geom_features=geom_feats, noise_mode="const",
                noise_buffers=params["noise"] or None,
                return_debug_data=True)
            synth = img
            if cfg.with_composite:
                synth = composite_with_bg_color(debug, bg_color)
            losses = {"lpips": jnp.mean(lpips_batched(target, synth))}
            if cfg.l1_fg_weight > 0:
                fmask = fg.astype(jnp.float32)
                losses["l1"] = jnp.sum(
                    jnp.abs(target - synth) * fmask) / \
                    jnp.clip(jnp.sum(fmask) * 3, 1, None)
            if cfg.bg_weight > 0:
                bmask = bg[..., 0].astype(jnp.float32)
                losses["bg"] = jnp.sum(
                    (1.0 - debug["uvs"][..., 2]) * bmask) / \
                    jnp.clip(jnp.sum(bmask), 1, None)
            losses["reg"] = _noise_autocorr_reg(params["noise"])
            weights = {"lpips": 1.0, "reg": cfg.regularize_noise_weight,
                       "l1": cfg.l1_fg_weight, "bg": cfg.bg_weight}
            total = sum(weights[k] * v for k, v in losses.items())
            return total, losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        # adam was built with lr=1; apply the cosine-ramped lr here.
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        # Renormalize noise to zero mean / unit power (project_main:214-218).
        params = dict(params, noise={
            k: (v - jnp.mean(v)) * jax.lax.rsqrt(jnp.mean(jnp.square(v))
                                                 + 1e-12)
            for k, v in params["noise"].items()})
        return params, opt_state, losses

    best = {"lpips": np.inf, "w": np.asarray(params["w"]),
            "noise": {k: np.asarray(v) for k, v in noise_bufs.items()}}
    prev_best = None
    key = jax.random.PRNGKey(seed)
    final_step = 0
    for step in range(cfg.num_steps):
        key, sub = jax.random.split(key)
        params, opt_state, losses = step_fn(params, opt_state,
                                            jnp.float32(step), sub)
        lp = float(losses["lpips"])
        if lp < best["lpips"]:
            best = {"lpips": lp, "w": np.asarray(params["w"]),
                    "noise": {k: np.asarray(v)
                              for k, v in params["noise"].items()}}
        final_step = step
        if step % log_every == 0:
            logger.info("Step %d: lpips %.4f (best %.4f)", step, lp,
                        best["lpips"])
            if prev_best is not None and \
                    prev_best - best["lpips"] < cfg.min_lpips_improvement:
                logger.info("LPIPS plateau at step %d", step)
                break
            prev_best = best["lpips"]

    return {"w": best["w"], "noise": best["noise"],
            "bg": np.asarray(bg_color).reshape(-1, 3).mean(0),
            "step": final_step, "lpips": best["lpips"]}
