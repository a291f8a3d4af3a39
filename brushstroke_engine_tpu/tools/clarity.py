"""Post-hoc background-clarity finetuning of library styles.

Rebuild of the reference clarity optimization (scripts/opt_clarity_main.py):
for each style in a W brush library, optimize its W+ to improve background
clarity while staying perceptually close to the original render.  Default
objective (opt_clarity_main.py:290):

    0.5*iou_inv(uvs) + 0.5*iou(u) + 50*lpips(fake_orig) + 50*l1(fake_orig)

expressed through the same loss DSL as training.  Frozen-W targets are
re-rendered on fresh geometry each step (:112-117).
"""

from __future__ import annotations

import logging
import pickle
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from brushstroke_engine_tpu.models.generator import generator_apply
from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode
from brushstroke_engine_tpu.train.losses import ForgerLosses

logger = logging.getLogger(__name__)

DEFAULT_LOSSES = ("0.5*iou_inv(uvs)+0.5*iou(u)"
                  "+50*lpips(fake_orig)+50*l1(fake_orig)")


@dataclass(frozen=True)
class ClarityConfig:
    num_steps: int = 300
    learning_rate: float = 0.01
    losses: str = DEFAULT_LOSSES


def optimize_style_clarity(engine, w_init, geometry_batches,
                           cfg: ClarityConfig = ClarityConfig(),
                           noise_buffers: Optional[Dict] = None,
                           seed: int = 0) -> Dict:
    """Optimize one style's W+ for clarity.

    Args:
      engine: GanPaintEngine.
      w_init: [1, num_ws, w_dim] starting style.
      geometry_batches: iterator of [B, W, W, 1] float geometry patches
        (0 = FG); a fresh batch is consumed each step.

    Returns {'w': optimized W+, 'loss': final total}.
    """
    gen_cfg = engine.gen_cfg
    losses = ForgerLosses.create_from_string(cfg.losses)
    g_state = {"w_avg": engine.gen_state.get("w_avg"),
               "noise": engine.gen_state["noise"]}
    w_frozen = jnp.asarray(w_init, jnp.float32)

    params = {"w": jnp.asarray(w_init, jnp.float32)}
    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(params)

    def render(ws, feats, batch):
        ws_b = jnp.tile(ws, (batch, 1, 1))
        img, debug, _ = generator_apply(
            gen_cfg, engine.gen_params, g_state, ws=ws_b,
            geom_features=feats, noise_mode="const",
            noise_buffers=noise_buffers, return_debug_data=True)
        return img, debug

    def step_once(params, opt_state, geom, key):
        feats = geo_encoder_encode(engine.enc_cfg, engine.enc_params,
                                   engine.enc_state, geom,
                                   res=list(engine.enc_res))
        b = geom.shape[0]
        fake_orig, _ = render(w_frozen, feats, b)
        fake_orig = jax.lax.stop_gradient(fake_orig)

        def loss_fn(params):
            img, debug = render(params["w"], feats, b)
            debug = dict(debug, fake_img=img, fake_orig=fake_orig)
            total, items = losses.compute(debug, geom, rng=key)
            return total, items

        (total, items), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total

    # One dispatch per LOG interval, not per step: scan over a stacked
    # chunk of geometry batches (a host loop pays a dispatch round trip
    # per step -- ruinous over the dev-TPU tunnel, wasteful anywhere).
    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("k",))
    def run_chunk(params, opt_state, geoms, key, k):
        def body(carry, xs):
            params, opt_state = carry
            geom, i = xs
            params, opt_state, total = step_once(
                params, opt_state, geom, jax.random.fold_in(key, i))
            return (params, opt_state), total
        (params, opt_state), totals = jax.lax.scan(
            body, (params, opt_state), (geoms, jnp.arange(k)))
        return params, opt_state, totals[-1]

    key = jax.random.PRNGKey(seed)
    total = jnp.inf
    step = 0
    while step < cfg.num_steps:
        k = min(50, cfg.num_steps - step)
        geoms = jnp.asarray(np.stack(
            [next(geometry_batches) for _ in range(k)]), jnp.float32)
        key, sub = jax.random.split(key)
        params, opt_state, total = run_chunk(params, opt_state, geoms,
                                             sub, k)
        step += k
        logger.info("clarity step %d: loss %.4f", step, float(total))
    return {"w": np.asarray(params["w"]), "loss": float(total)}


def optimize_library_clarity(engine, library, geometry_batches,
                             out_path: Optional[str] = None,
                             cfg: ClarityConfig = ClarityConfig()) -> Dict:
    """Optimize every style in a brush library; write OPT_<name>.pkl
    (reference opt_clarity_main.py:258-266)."""
    from brushstroke_engine_tpu.engine.brush import GanBrushOptions
    from brushstroke_engine_tpu.models.mapping import mapping_apply

    results = {}
    for style_id in library.get_style_ids():
        opts = GanBrushOptions()
        library.set_style(style_id, opts)
        if opts.style_ws is not None:
            w0 = opts.style_ws
        else:
            ws, _ = mapping_apply(
                engine.gen_cfg.mapping, engine.gen_params["mapping"],
                jnp.asarray(opts.style_z, jnp.float32), None,
                w_avg=engine.gen_state.get("w_avg"))
            w0 = np.asarray(ws)
        nb = opts.custom_args.get("noise_buffers")
        if nb:
            nb = {k: jnp.asarray(np.asarray(v).reshape(
                np.asarray(v).shape[-2:])) for k, v in nb.items()}
        res = optimize_style_clarity(engine, w0, geometry_batches, cfg,
                                     noise_buffers=nb or None)
        entry = {"w": res["w"]}
        raw_nb = opts.custom_args.get("noise_buffers")
        if raw_nb:
            entry["noise"] = raw_nb
        results[style_id] = entry
        logger.info("optimized style %s: loss %.4f", style_id, res["loss"])

    if out_path is not None:
        with open(out_path, "wb") as f:
            pickle.dump(results, f)
    return results
