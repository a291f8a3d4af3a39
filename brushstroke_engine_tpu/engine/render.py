"""Jitted functional render core for the paint engines.

This is the TPU-first heart of the interactive path: ONE jitted function runs
geometry encoding, generator synthesis, UVS clarity mapping, user-color
override, and RGBA compositing.  The reference spreads this across
encoder.encode / G.forward / mapper.map_style / prepare_colors / compositing
in eager torch (forger/ui/brush.py:731-805); here XLA fuses the whole patch
render into a single device program, and the host only moves uint8 patches.

Dynamic inputs (no recompilation): style (z or ws), patch position, per-style
noise buffers, user color overrides, blended-feature tensors, and the clarity
sfactor.  Static switches (trigger one-time specialization): model configs,
render mode, geometry injection resolutions, exported feature resolutions.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.models.generator import (
    GeneratorConfig, generator_apply,
)
from brushstroke_engine_tpu.models.geo_encoder import (
    GeoEncoderConfig, geo_encoder_encode,
)


def map_uvs_s(uvs, sfactor):
    """Background-clarity UVS remap (reference mapper.py:52-72).

    S' = clamp(sfactor * S, 0, 1); U, V rescaled to keep the partition of
    unity: (U', V') = (U, V) * (1 - S') / (U + V).
    """
    u = uvs[..., 0:1]
    v = uvs[..., 1:2]
    s = uvs[..., 2:3]
    sp = jnp.minimum(sfactor * s, 1.0)
    delta = 1.0 - sp
    eps = 1e-6
    uv = jnp.maximum(u + v, eps)
    uvfactor = jnp.where(delta <= eps, 0.0, delta / uv)
    return jnp.concatenate([uvfactor * u, uvfactor * v, sp], axis=-1)


def _render_core_impl(gen_cfg: GeneratorConfig, enc_cfg: GeoEncoderConfig,
                      enc_res: Tuple[int, ...], render_mode: str,
                      return_features: Tuple[int, ...], color_format: str,
                      gen_params, gen_state, enc_params, enc_state,
                      geom, z, ws, positions, noise_buffers,
                      color_override, color_mask, blended_features,
                      sfactor):
    """Render a batch of stroke patches.

    Args:
      geom: ``[B, W, W, 1]`` float in [0,1], 1 = background.
      z: ``[B, z_dim]`` or None;  ws: ``[B, num_ws, w_dim]`` or None.
      positions: ``[B, 2]`` int (y, x) canvas positions or None.
      noise_buffers: per-style noise dict (reference key format) or None.
      color_override: ``[B, 3, 3]`` user colors or None.
      color_mask: ``[1, 1, 3]`` float, 1 where override applies.
      blended_features: {res: (feats, alpha)} or None.
      sfactor: scalar clarity factor or None (disables UVS mapping).

    Returns:
      dict with 'rgba' ``[B, W, W, 4]`` in [0,1], 'uvs', 'colors',
      'raw_img', 'alpha_fg'/'canvas' (canvas format), and any
      'features{res}' requested.
    """
    feats = geo_encoder_encode(enc_cfg, enc_params, enc_state, geom,
                               res=list(enc_res))
    img, debug, _ = generator_apply(
        gen_cfg, gen_params, gen_state, z=z, ws=ws, geom_features=feats,
        positions=positions, noise_buffers=noise_buffers,
        noise_mode="const", return_debug_data=True,
        return_features=return_features, blended_features=blended_features)

    uvs = debug["uvs"]                              # [B, W, W, 3]
    colors = (debug["colors"] + 1.0) / 2.0          # [B, 3(rgb), 3(slot)]

    if sfactor is not None:
        uvs = map_uvs_s(uvs, sfactor)
    if color_override is not None:
        colors = color_mask * color_override + (1.0 - color_mask) * colors

    stroke = jnp.einsum("bhwk,bck->bhwc", uvs, colors)
    ones = jnp.ones_like(stroke[..., :1])

    if color_format == "triad":
        if render_mode == "clear":
            alpha = jnp.sum(uvs[..., 0:2], axis=-1, keepdims=True)
            rgba = jnp.concatenate([stroke, alpha], axis=-1)
        elif render_mode == "full":
            rgba = jnp.concatenate([stroke, ones], axis=-1)
        else:
            raise ValueError(f"triad engine: unknown render mode {render_mode}")
    else:  # canvas format (reference brush.py:905-947)
        alpha_fg = debug["alpha_fg"]
        gen_canvas = debug["canvas"]
        if render_mode == "clear":
            rgba = jnp.concatenate([stroke, alpha_fg], axis=-1)
        elif render_mode == "stroke":
            rgba = jnp.concatenate([stroke, ones], axis=-1)
        elif render_mode == "canvas":
            rgba = jnp.concatenate([(gen_canvas + 1.0) / 2.0, ones], axis=-1)
        elif render_mode == "full":
            comp = (1 - alpha_fg) * (gen_canvas + 1.0) / 2.0 \
                + alpha_fg * stroke
            rgba = jnp.concatenate([comp, ones], axis=-1)
        else:
            raise ValueError(f"canvas engine: unknown render mode {render_mode}")

    out = {"rgba": rgba, "uvs": uvs, "colors": colors, "raw_img": img}
    for r in return_features:
        out[f"features{r}"] = debug[f"features{r}"]
        out[f"features{r}_preblend"] = debug[f"features{r}_preblend"]
    for k in ("alpha_fg", "canvas"):
        if k in debug:
            out[k] = debug[k]
    return out


@partial(jax.jit, static_argnames=(
    "gen_cfg", "enc_cfg", "enc_res", "render_mode", "return_features",
    "color_format", "quant_scales"))
def render_core(gen_cfg: GeneratorConfig, enc_cfg: GeoEncoderConfig,
                enc_res: Tuple[int, ...], render_mode: str,
                return_features: Tuple[int, ...], color_format: str,
                gen_params, gen_state, enc_params, enc_state,
                geom, z, ws, positions, noise_buffers,
                color_override, color_mask, blended_features, sfactor,
                quant_scales: Tuple[float, ...] = None):
    """:func:`_render_core_impl` under jit.

    ``quant_scales``: optional per-call-site static int8 activation
    scales (engine.enable_int8_serving).  STATIC on purpose — the scales
    change the compiled program (int8 vs bf16 convs), so they must be
    part of the jit cache key; a trace-time-only context would silently
    reuse a bf16 executable compiled earlier for the same shapes.
    """
    from brushstroke_engine_tpu.ops import quant
    with quant.static_ctx(quant_scales):
        return _render_core_impl(
            gen_cfg, enc_cfg, enc_res, render_mode, return_features,
            color_format, gen_params, gen_state, enc_params, enc_state,
            geom, z, ws, positions, noise_buffers, color_override,
            color_mask, blended_features, sfactor)


@partial(jax.jit, static_argnames=("gen_cfg", "enc_cfg", "enc_res", "k"))
def sfactor_core(gen_cfg: GeneratorConfig, enc_cfg: GeoEncoderConfig,
                 enc_res: Tuple[int, ...], k: int,
                 gen_params, gen_state, enc_params, enc_state,
                 geom_med, bmask, z, ws):
    """Compute the per-style background-clarity factor
    (reference mapper.get_sfactor, mapper.py:117-136).

    Renders the medium curated geometry, takes per-patch the k-th largest S
    over known-background pixels (thick-geometry mask), then
    sfactor = 1 / min over patches.
    """
    feats = geo_encoder_encode(enc_cfg, enc_params, enc_state, geom_med,
                               res=list(enc_res))
    n = geom_med.shape[0]
    if ws is not None:
        ws_b = jnp.broadcast_to(ws, (n,) + ws.shape[1:])
        z_b = None
    else:
        z_b = jnp.broadcast_to(z, (n, z.shape[-1]))
        ws_b = None
    _, debug, _ = generator_apply(
        gen_cfg, gen_params, gen_state, z=z_b, ws=ws_b, geom_features=feats,
        noise_mode="const", return_debug_data=True)
    s = debug["uvs"][..., 2]                       # [N, W, W]
    s_masked = jnp.where(bmask, s, -jnp.inf)
    flat = s_masked.reshape(n, -1)
    topk = jax.lax.top_k(flat, k)[0]               # [N, k]
    val = jnp.min(topk[:, -1])                     # min over patches of k-th
    return 1.0 / val
