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

    def step_once(params, opt_state, best, step, key):
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
        # Track the best-so-far snapshot ON DEVICE: a host-side check would
        # force a device->host sync every step, serializing the dispatch
        # pipeline (costly in general, ruinous over the dev tunnel).
        better = losses["lpips"] < best["lpips"]
        best = {
            "lpips": jnp.where(better, losses["lpips"], best["lpips"]),
            "step": jnp.where(better, step, best["step"]),
            "w": jnp.where(better, params["w"], best["w"]),
            "noise": {k: jnp.where(better, v, best["noise"][k])
                      for k, v in params["noise"].items()},
        }
        return params, opt_state, best, losses["lpips"]

    best = _init_best(params, noise_bufs)
    params, best = _run_chunked(step_once, params, opt_state, best, cfg,
                                seed, log_every)
    return {"w": np.asarray(best["w"]),
            "noise": {k: np.asarray(v) for k, v in best["noise"].items()},
            "bg": np.asarray(bg_color).reshape(-1, 3).mean(0),
            "step": int(best["step"]), "lpips": float(best["lpips"])}


def _init_best(params, noise_bufs, n: Optional[int] = None):
    """Best-so-far carry.  Leaves are COPIES: params is donated separately,
    and a shared buffer inside two donated arguments is a donation
    conflict."""
    shape = () if n is None else (n,)
    return {"lpips": jnp.full(shape, np.inf, jnp.float32),
            "step": jnp.zeros(shape, jnp.float32),
            "w": jnp.copy(params["w"]),
            "noise": {k: jnp.copy(v) for k, v in noise_bufs.items()}}


def _run_chunked(step_once, params, opt_state, best, cfg, seed, log_every):
    """Drive the optimization as ONE ``lax.scan`` dispatch per log
    interval.

    A host-side per-step loop pays a dispatch per step (and a second one
    for the RNG split); over the dev tunnel that is ~100 ms/step of pure
    latency against ~tens of ms of compute.  Scanning ``log_every`` steps
    on device makes the loop dispatch-bound only once per interval, with
    the plateau check reading back a single scalar."""
    key = jax.random.PRNGKey(seed)

    @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("k",))
    def run_chunk(params, opt_state, best, step0, key, k):
        def body(carry, i):
            params, opt_state, best = carry
            step = step0 + i.astype(jnp.float32)
            params, opt_state, best, lp = step_once(
                params, opt_state, best, step,
                jax.random.fold_in(key, i))
            return (params, opt_state, best), lp
        (params, opt_state, best), lps = jax.lax.scan(
            body, (params, opt_state, best), jnp.arange(k))
        return params, opt_state, best, lps

    prev_best = None
    step = 0
    while step < cfg.num_steps:
        k = min(log_every, cfg.num_steps - step)
        key, sub = jax.random.split(key)
        params, opt_state, best, lps = run_chunk(
            params, opt_state, best, jnp.float32(step), sub, k)
        step += k
        bl = float(jnp.mean(best["lpips"]))
        logger.info("Step %d: lpips %.4f (best %.4f)", step,
                    float(jnp.mean(lps[-1])), bl)
        if prev_best is not None and \
                prev_best - bl < cfg.min_lpips_improvement:
            logger.info("LPIPS plateau at step %d", step)
            break
        prev_best = bl
    return params, best


def project_parallel(engine, targets, geoms,
                     cfg: ProjectionConfig = ProjectionConfig(),
                     seed: int = 0, log_every: int = 100):
    """Project N independent styles in ONE chip program.

    The reference projects styles sequentially (one ~1000-step Adam run
    per artwork, scripts/project_main.py); on TPU the per-style batches
    are far too small to fill the MXU, so N independent optimizations
    are stacked on a leading style axis and the whole step -- N
    synthesis forwards/backwards, N LPIPS evaluations, N Adam updates --
    runs as one ``jax.vmap``-ed jitted dispatch.  Projecting a library
    of styles costs roughly one style's wall-clock.

    Args:
      engine: a GanPaintEngine.
      targets: [N, B, W, W, 3] float in [-1, 1].
      geoms: [N, B, W, W, 1] float, 0 = FG.

    Returns a list of N result dicts shaped like :func:`project`'s.
    """
    from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode

    gen_cfg = engine.gen_cfg
    targets = jnp.asarray(targets, jnp.float32)
    geoms = jnp.asarray(geoms, jnp.float32)
    n, b = targets.shape[:2]
    flat_geom = geoms.reshape((n * b,) + geoms.shape[2:])
    flat_feats = geo_encoder_encode(engine.enc_cfg, engine.enc_params,
                                    engine.enc_state, flat_geom,
                                    res=list(engine.enc_res))
    geom_feats = [f.reshape((n, b) + f.shape[1:]) for f in flat_feats]
    fg, bg = get_conservative_fg_bg(flat_geom)
    fg = fg.reshape((n, b) + fg.shape[1:])
    bg = bg.reshape((n, b) + bg.shape[1:])
    bg_color = jax.vmap(compute_masked_color)(targets, bg)

    w_avg, w_std = get_w_stats(gen_cfg, engine.gen_params["mapping"],
                               num_samples=cfg.w_avg_samples, seed=seed)
    num_ws = gen_cfg.num_ws
    w_start = np.tile(w_avg, (n, 1, num_ws if cfg.w_plus else 1, 1))

    rng = np.random.RandomState(seed)
    noise_bufs = {}
    if cfg.optimize_noise:
        for k, v in engine.gen_state["noise"].items():
            noise_bufs[k] = jnp.asarray(
                rng.randn(n, *np.asarray(v).shape), jnp.float32)

    params = {"w": jnp.asarray(w_start, jnp.float32), "noise": noise_bufs}
    opt = optax.adam(learning_rate=1.0, b1=0.9, b2=0.999)
    opt_state = opt.init(params)
    g_state = {"w_avg": engine.gen_state.get("w_avg"),
               "noise": engine.gen_state["noise"]}

    def style_loss(p, key, target, feats, fgm, bgm, bgc, w_noise_scale):
        """Loss for ONE style (leading axis removed by vmap)."""
        w_noise = jax.random.normal(key, p["w"].shape) * w_noise_scale
        ws = p["w"] + w_noise
        if not cfg.w_plus:
            ws = jnp.tile(ws, (1, num_ws, 1))
        ws = jnp.tile(ws, (target.shape[0], 1, 1))
        img, debug, _ = generator_apply(
            gen_cfg, engine.gen_params, g_state, ws=ws,
            geom_features=feats, noise_mode="const",
            noise_buffers=p["noise"] or None, return_debug_data=True)
        synth = img
        if cfg.with_composite:
            synth = composite_with_bg_color(debug, bgc)
        losses = {"lpips": jnp.mean(lpips_batched(target, synth))}
        if cfg.l1_fg_weight > 0:
            fmask = fgm.astype(jnp.float32)
            losses["l1"] = jnp.sum(jnp.abs(target - synth) * fmask) / \
                jnp.clip(jnp.sum(fmask) * 3, 1, None)
        if cfg.bg_weight > 0:
            bmask = bgm[..., 0].astype(jnp.float32)
            losses["bg"] = jnp.sum(
                (1.0 - debug["uvs"][..., 2]) * bmask) / \
                jnp.clip(jnp.sum(bmask), 1, None)
        losses["reg"] = _noise_autocorr_reg(p["noise"])
        weights = {"lpips": 1.0, "reg": cfg.regularize_noise_weight,
                   "l1": cfg.l1_fg_weight, "bg": cfg.bg_weight}
        return sum(weights[k] * v for k, v in losses.items()), losses

    def step_once(params, opt_state, best, step, key):
        t = step / cfg.num_steps
        w_noise_scale = w_std * cfg.initial_noise_factor * \
            jnp.maximum(0.0, 1.0 - t / cfg.noise_ramp_length) ** 2
        lr = _lr_schedule(cfg, step)
        keys = jax.random.split(key, n)

        def total_loss(params):
            totals, losses = jax.vmap(
                style_loss, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
                params, keys, targets, geom_feats, fg, bg, bg_color,
                w_noise_scale)
            return jnp.sum(totals), losses

        (_, losses), grads = jax.value_and_grad(
            total_loss, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        params = dict(params, noise={
            k: (v - jnp.mean(v, axis=tuple(range(1, v.ndim)),
                             keepdims=True))
            * jax.lax.rsqrt(jnp.mean(jnp.square(v),
                                     axis=tuple(range(1, v.ndim)),
                                     keepdims=True) + 1e-12)
            for k, v in params["noise"].items()})

        # Per-style best-so-far tracking ON DEVICE (see project()): the
        # [N] improvement mask broadcasts against each leaf's leading
        # style axis.
        better = losses["lpips"] < best["lpips"]            # [N]

        def sel(new, old):
            m = better.reshape((n,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        best = {
            "lpips": jnp.where(better, losses["lpips"], best["lpips"]),
            "step": jnp.where(better, step, best["step"]),
            "w": sel(params["w"], best["w"]),
            "noise": {k: sel(v, best["noise"][k])
                      for k, v in params["noise"].items()},
        }
        return params, opt_state, best, losses["lpips"]

    best = _init_best(params, noise_bufs, n=n)
    params, best = _run_chunked(step_once, params, opt_state, best, cfg,
                                seed, log_every)
    bgc = np.asarray(bg_color)
    lp = np.asarray(best["lpips"])
    stp = np.asarray(best["step"])
    w_np = np.asarray(best["w"])
    noise_np = {k: np.asarray(v) for k, v in best["noise"].items()}
    return [{"lpips": float(lp[i]), "step": int(stp[i]), "w": w_np[i],
             "noise": {k: v[i] for k, v in noise_np.items()},
             "bg": bgc[i].reshape(-1, 3).mean(0)}
            for i in range(n)]
