"""Geometry-conditioned Generator: mapping + synthesis + positional encoding.

Functional rebuild of the reference modified Generator
(reference: thirdparty/.../training/networks_modified.py:228-401), including
``forward_pre_mapped`` (pre-mapped W path used by brush libraries),
position-normalized noise wrapping, positional-encoding generation, and
``set_trainable_layers`` re-expressed as an optax-style boolean param mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.models.mapping import (
    MappingConfig, mapping_init, mapping_apply,
)
from brushstroke_engine_tpu.models.synthesis import (
    SynthesisConfig, synthesis_init, synthesis_apply,
)
from brushstroke_engine_tpu.models import positional


@dataclass(frozen=True)
class GeneratorConfig:
    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int = 3
    synthesis: SynthesisConfig = None
    mapping_layers: int = 8
    # Positional encoding (reference positional_kwargs).
    positional_encoding: Optional[str] = None       # 'grid'|'sine:N'|'simplesine'
    posenc_inject_resolutions: Tuple[int, ...] = () # 0 -> 4px, 1 -> 8px, ...
    posenc_featuremap_mode: str = "fixed"           # 'fixed' | 'varying'
    posenc_injection_mode: str = "cat"

    @property
    def pos_encoder(self) -> Optional[positional.PositionalEncoderConfig]:
        if self.positional_encoding is None:
            return None
        return positional.PositionalEncoderConfig.from_string(
            self.positional_encoding, self.img_resolution)

    @property
    def mapping(self) -> MappingConfig:
        return MappingConfig(z_dim=self.z_dim, c_dim=self.c_dim,
                             w_dim=self.w_dim, num_ws=self.num_ws,
                             num_layers=self.mapping_layers)

    @property
    def num_ws(self) -> int:
        return self.synthesis.num_ws


def make_generator_config(
    z_dim=64, c_dim=0, w_dim=64, img_resolution=128, img_channels=3,
    geom_feature_resolutions=(), geom_feature_channels=(),
    color_format="triad", color_w_channels=0, architecture="orig",
    channel_base=16384, channel_max=128, num_bf16_res=0, conv_clamp=256.0,
    mapping_layers=8, positional_encoding=None, posenc_inject_resolutions=(),
    posenc_featuremap_mode="fixed", posenc_injection_mode="cat",
) -> GeneratorConfig:
    """Build a GeneratorConfig with a consistent SynthesisConfig.

    ``posenc_inject_resolutions`` uses the reference index convention
    (0 -> 4px, 1 -> 8px, ...; networks_modified.py:276-277).
    """
    pos_res = tuple(2 ** (2 + r) for r in posenc_inject_resolutions)
    enc_ch = 0
    if positional_encoding is not None:
        enc_ch = positional.PositionalEncoderConfig.from_string(
            positional_encoding, img_resolution).out_channels
    syn = SynthesisConfig(
        w_dim=w_dim, img_resolution=img_resolution, img_channels=img_channels,
        geom_feature_resolutions=tuple(geom_feature_resolutions),
        geom_feature_channels=tuple(geom_feature_channels),
        color_format=color_format, color_w_channels=color_w_channels,
        architecture=architecture, channel_base=channel_base,
        channel_max=channel_max, num_bf16_res=num_bf16_res,
        conv_clamp=conv_clamp,
        pos_encoding_channels=enc_ch,
        pos_encoding_resolutions=pos_res,
        pos_encoding_injection_mode=posenc_injection_mode,
    )
    return GeneratorConfig(
        z_dim=z_dim, c_dim=c_dim, w_dim=w_dim, img_resolution=img_resolution,
        img_channels=img_channels, synthesis=syn,
        mapping_layers=mapping_layers,
        positional_encoding=positional_encoding,
        posenc_inject_resolutions=tuple(posenc_inject_resolutions),
        posenc_featuremap_mode=posenc_featuremap_mode,
        posenc_injection_mode=posenc_injection_mode,
    )


def generator_init(cfg: GeneratorConfig, key):
    """Returns (params, state) where state = {'w_avg', 'noise': {...}}."""
    k_map, k_syn = jax.random.split(key)
    map_params, map_state = mapping_init(cfg.mapping, k_map)
    syn_params, noise = synthesis_init(cfg.synthesis, k_syn)
    params = {"mapping": map_params, "synthesis": syn_params}
    state = {"noise": noise}
    state.update(map_state)
    return params, state


def generate_positional_encoding(cfg: GeneratorConfig, positions, batch: int,
                                 rng=None):
    """Build the per-resolution positional encodings (networks_modified.py:320)."""
    enc_cfg = cfg.pos_encoder
    if enc_cfg is None:
        return None
    if positions is None:
        assert rng is not None
        positions = jax.random.randint(rng, (batch, 2), 0,
                                       cfg.img_resolution)
    encodings = []
    if cfg.posenc_featuremap_mode == "fixed":
        # One encoding per patch, broadcast over the feature map.
        enc = positional.encode_xy(enc_cfg, positions[:, 1], positions[:, 0])
        for r in cfg.posenc_inject_resolutions:
            fmap = 2 ** (2 + r)
            encodings.append(jnp.broadcast_to(
                enc[:, None, None, :], (batch, fmap, fmap, enc.shape[-1])))
    elif cfg.posenc_featuremap_mode == "varying":
        for r in cfg.posenc_inject_resolutions:
            fmap = 2 ** (2 + r)
            encodings.append(positional.encode_grid(
                enc_cfg, positions[:, 1], positions[:, 0], fmap))
    else:
        raise ValueError(cfg.posenc_featuremap_mode)
    return encodings


def generator_apply(cfg: GeneratorConfig, params, state, *,
                    z=None, c=None, ws=None, geom_features=(),
                    positions=None, noise_buffers=None,
                    truncation_psi: float = 1.0,
                    truncation_cutoff: Optional[int] = None,
                    noise_mode: str = "const", rng=None,
                    return_debug_data: bool = False,
                    return_features: Tuple[int, ...] = (),
                    blended_features: Optional[Dict] = None,
                    style_mixing_rng=None, style_mixing_prob: float = 0.0,
                    update_w_avg: bool = False,
                    force_fp32: bool = False):
    """Full generator forward.

    Pass ``ws`` for the pre-mapped path (reference forward_pre_mapped,
    networks_modified.py:346-365) or ``z`` for the mapped path (:367).

    Returns (img, debug_data, new_w_avg); debug_data is {} unless debug /
    feature outputs were requested; new_w_avg is None unless update_w_avg.
    """
    new_w_avg = None
    if ws is None:
        assert z is not None
        ws, new_w_avg = mapping_apply(
            cfg.mapping, params["mapping"], z, c,
            w_avg=state.get("w_avg"), truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff, update_w_avg=update_w_avg)
        if style_mixing_prob > 0:
            assert style_mixing_rng is not None
            k1, k2, k3 = jax.random.split(style_mixing_rng, 3)
            num_ws = ws.shape[1]
            cutoff = jax.random.randint(k1, (), 1, num_ws)
            cutoff = jnp.where(
                jax.random.uniform(k2, ()) < style_mixing_prob, cutoff,
                num_ws)
            ws2, _ = mapping_apply(
                cfg.mapping, params["mapping"],
                jax.random.normal(k3, z.shape, z.dtype), c,
                w_avg=state.get("w_avg"), truncation_psi=truncation_psi,
                truncation_cutoff=truncation_cutoff, update_w_avg=False)
            idx = jnp.arange(num_ws)[None, :, None]
            ws = jnp.where(idx < cutoff, ws, ws2)

    batch = ws.shape[0]
    pos_rng = None
    if rng is not None:
        rng, pos_rng = jax.random.split(rng)
    pos_encoding = generate_positional_encoding(cfg, positions, batch,
                                                rng=pos_rng)

    out = synthesis_apply(
        cfg.synthesis, params["synthesis"], ws, geom_features,
        noise=state.get("noise"), noise_buffers=noise_buffers,
        positions=positions, pos_encoding=pos_encoding,
        noise_mode=noise_mode, rng=rng,
        return_debug_data=return_debug_data,
        return_features=tuple(return_features),
        blended_features=blended_features, force_fp32=force_fp32)

    if return_debug_data or return_features:
        img, debug = out
        if return_debug_data:
            debug["ws"] = ws
    else:
        img, debug = out, {}
    return img, debug, new_w_avg


def generator_trainable_mask(cfg: GeneratorConfig, params,
                             mode="all") -> Dict:
    """Boolean pytree mask for partial training (reference
    set_trainable_layers, networks_modified.py:285-318).

    Modes (string or list): 'all', 'rgb', 'last_and_rgb', 'linear',
    'all_but_linear'.  Use with ``optax.masked`` or by zeroing grads.
    """
    modes = mode if isinstance(mode, (list, tuple)) else [mode]
    last = f"b{cfg.img_resolution}"

    def deep(d, value):
        return jax.tree_util.tree_map(lambda _: value, d)

    mask = deep(params, False)
    for m in modes:
        if m == "all":
            mask = deep(params, True)
        elif m == "all_but_linear":
            mask = deep(params, True)  # geom_linear is not implemented
        elif m == "rgb":
            mask = dict(mask)
            mask["synthesis"] = dict(mask["synthesis"])
            mask["synthesis"][last] = dict(mask["synthesis"][last])
            mask["synthesis"][last]["torgb"] = deep(
                params["synthesis"][last]["torgb"], True)
        elif m == "last_and_rgb":
            mask = dict(mask)
            mask["synthesis"] = dict(mask["synthesis"])
            mask["synthesis"][last] = deep(params["synthesis"][last], True)
        elif m == "linear":
            pass  # geom_linear not implemented (reference asserts the same)
        else:
            raise ValueError(f"unknown trainable mode {m!r}")
    return mask
