"""Geometry-conditioned StyleGAN2 synthesis network (NeuBE trunk).

Functional rebuild of the reference:
  * SynthesisLayer / ToRGBLayer / ToRGBColorTriadLayer / SynthesisBlock
    (thirdparty/.../training/networks.py:303-680)
  * geometry-conditioned SynthesisNetwork
    (thirdparty/.../training/networks_modified.py:28-223)

Capabilities carried over: per-resolution geometry feature injection (channel
widening), positional-encoding injection (cat/add), position-wrapped constant
noise, per-style noise-buffer overrides, trunk-feature export
(``return_features``) and cross-patch feature blending (``blended_features``
with torgb re-run at the final resolution), and the color-triad / canvas
output heads.

Structure: static ``SynthesisConfig`` precomputes the whole channel plan;
params are nested dicts keyed like the reference modules (``b128.conv0`` ...)
so checkpoints map 1:1; noise textures live in a separate flat ``noise``
buffer dict keyed ``"b128.conv0.noise_const"`` -- the exact key format the
reference uses for per-style noise buffers in brush libraries, so converted
libraries drop straight in.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.ops import (
    bias_act, activation_gain, modulated_conv2d, upsample2d, setup_filter,
    wrapped_const_noise,
)
from brushstroke_engine_tpu.models.layers import fc_init, fc_apply


@dataclass(frozen=True)
class SynthesisConfig:
    w_dim: int
    img_resolution: int
    img_channels: int = 3
    # Geometry injection: after the block at resolution r (pixel units),
    # concatenate geom feature i with geom_feature_channels[i] channels.
    geom_feature_resolutions: Tuple[int, ...] = ()
    geom_feature_channels: Tuple[int, ...] = ()
    color_format: str = "triad"          # 'orig' | 'triad' | 'canvas'
    color_w_channels: int = 0
    architecture: str = "orig"           # 'orig' | 'skip'
    channel_base: int = 16384
    channel_max: int = 128
    num_bf16_res: int = 0                # N highest resolutions run in bf16.
    conv_clamp: Optional[float] = 256.0
    resample_taps: Tuple[int, ...] = (1, 3, 3, 1)
    activation: str = "lrelu"
    # Positional encoding injection.
    pos_encoding_channels: int = 0
    pos_encoding_resolutions: Tuple[int, ...] = ()
    pos_encoding_injection_mode: str = "cat"

    def __post_init__(self):
        assert self.img_resolution >= 4 and \
            self.img_resolution & (self.img_resolution - 1) == 0
        assert self.color_format in ("orig", "triad", "canvas")
        if self.color_format != "orig":
            assert self.architecture == "orig", \
                "triad/canvas heads require the 'orig' trunk (reference " \
                "networks.py:589)"

    @property
    def block_resolutions(self) -> Tuple[int, ...]:
        n = int(math.log2(self.img_resolution))
        return tuple(2 ** i for i in range(2, n + 1))

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    def extra_in_channels(self, prev_res: int) -> int:
        """Channels appended to the trunk after the block at prev_res."""
        extra = 0
        if prev_res in self.geom_feature_resolutions:
            idx = self.geom_feature_resolutions.index(prev_res)
            extra += self.geom_feature_channels[idx]
        if (prev_res in self.pos_encoding_resolutions
                and self.pos_encoding_injection_mode == "cat"):
            extra += self.pos_encoding_channels
        return extra

    def block_in_channels(self, res: int) -> int:
        if res == 4:
            return 0
        return self.channels(res // 2) + self.extra_in_channels(res // 2)

    def block_is_last(self, res: int) -> bool:
        return res == self.img_resolution

    def block_has_torgb(self, res: int) -> bool:
        return self.block_is_last(res) or self.architecture == "skip"

    def block_num_conv(self, res: int) -> int:
        return 1 if res == 4 else 2

    def block_dtype(self, res: int):
        bf16_res = max(2 ** (int(math.log2(self.img_resolution)) + 1
                             - self.num_bf16_res), 8)
        return jnp.bfloat16 if res >= bf16_res else jnp.float32

    @property
    def num_ws(self) -> int:
        n = sum(self.block_num_conv(r) for r in self.block_resolutions)
        return n + 1  # +1 for the (last) torgb w.

    @property
    def torgb_extra_channels(self) -> int:
        return 5 if self.color_format == "canvas" else 0

    @property
    def resample_filter(self):
        return setup_filter(list(self.resample_taps))


# ---------------------------------------------------------------------------
# SynthesisLayer (reference networks.py:303-391)
# ---------------------------------------------------------------------------

def _synthesis_layer_init(key, in_ch, out_ch, w_dim, kernel_size=3):
    k_affine, k_weight = jax.random.split(key)
    return {
        "affine": fc_init(k_affine, w_dim, in_ch, bias_init=1.0),
        "weight": jax.random.normal(
            k_weight, (kernel_size, kernel_size, in_ch, out_ch), jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
        "noise_strength": jnp.zeros((), jnp.float32),
    }


def _synthesis_layer_apply(cfg: SynthesisConfig, params, x, w, *,
                           resolution: int, up: int = 1,
                           noise_mode: str = "const",
                           noise_const=None, input_noise=None,
                           positions=None, rng=None, gain: float = 1.0):
    styles = fc_apply(params["affine"], w.astype(jnp.float32))
    b = x.shape[0]

    noise = None
    if noise_mode == "random":
        assert rng is not None, "random noise_mode needs an rng key"
        noise = jax.random.normal(
            rng, (b, resolution, resolution, 1), jnp.float32) \
            * params["noise_strength"]
    elif noise_mode == "const":
        tex = input_noise if input_noise is not None else noise_const
        if tex is not None:
            if positions is not None:
                noise = wrapped_const_noise(tex, positions,
                                            cfg.img_resolution)
            else:
                noise = tex[None, :, :, None]
            noise = noise * params["noise_strength"]

    x = modulated_conv2d(
        x, params["weight"], styles,
        noise=None if noise is None else noise.astype(x.dtype),
        up=up, padding=params["weight"].shape[0] // 2,
        resample_filter=cfg.resample_filter,
        flip_weight=(up == 1))

    act_gain = activation_gain(cfg.activation) * gain
    act_clamp = cfg.conv_clamp * gain if cfg.conv_clamp is not None else None
    return bias_act(x, params["bias"].astype(x.dtype), dim=-1,
                    act=cfg.activation, gain=act_gain, clamp=act_clamp)


# ---------------------------------------------------------------------------
# Output heads (reference networks.py:396-536)
# ---------------------------------------------------------------------------

def color_mapping_init(key, w_dim: int, layer_features=(128, 32)):
    """ColorMappingNetwork params: small MLP w -> 9 color scalars
    (reference networks.py:178-212; declared in the reference but the
    shipped color path lives in ToRGBColorTriadLayer -- kept for parity)."""
    sizes = [w_dim] + list(layer_features) + [9]
    params = {}
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        params[f"fc{i}"] = fc_init(sub, sizes[i], sizes[i + 1])
    return params


def color_mapping_apply(params, w, activation: str = "lrelu",
                        normalize: bool = True):
    """w [B, w_dim] -> colors [B, 3, 3] (tanh-normalized)."""
    x = w.astype(jnp.float32)
    n = len(params)
    for i in range(n):
        x = fc_apply(params[f"fc{i}"], x, activation=activation)
    colors = x.reshape((-1, 3, 3))
    if normalize:
        colors = jnp.tanh(colors)
    return colors


def to_canvas_stroke_init(key, in_ch: int, out_ch: int, w_dim: int):
    """ToCanvasStrokeLayer params (reference networks.py:489-536): canvas +
    uvs weights + single alpha channel, colors from the affine."""
    k_affine, k_weight = jax.random.split(key)
    n_color = 9
    out_total = out_ch + 3 + 1  # canvas(out_ch=3) + uvs(3) + alpha(1)
    return {
        "affine": fc_init(k_affine, w_dim, in_ch + n_color, bias_init=1.0),
        "weight": jax.random.normal(k_weight, (1, 1, in_ch, out_total),
                                    jnp.float32),
        "bias": jnp.zeros((out_total,), jnp.float32),
        "color_bias": jnp.zeros((n_color,), jnp.float32),
    }


def to_canvas_stroke_apply(params, x, w, conv_clamp=None):
    """Alternative canvas head: tanh canvas + softmax uvs + tanh alpha
    (reference networks.py:520-536).  Returns (img, debug_data)."""
    in_ch = params["weight"].shape[2]
    weight_gain = 1.0 / math.sqrt(in_ch)
    scaled = fc_apply(params["affine"], w.astype(jnp.float32))
    colors = scaled[:, :9]
    styles = scaled[:, 9:] * weight_gain
    colors = bias_act(colors, params["color_bias"], dim=-1, act="tanh")
    colors = colors.reshape((-1, 3, 3))
    x = modulated_conv2d(x, params["weight"], styles, demodulate=False)
    x = bias_act(x, params["bias"].astype(x.dtype), dim=-1, clamp=conv_clamp)
    x = x.astype(jnp.float32)
    canvas = jnp.tanh(x[..., :3])
    uvs = jax.nn.softmax(x[..., 3:6], axis=-1)
    alpha_fg = (jnp.tanh(x[..., 6:]) + 1.0) / 2.0
    stroke = jnp.einsum("bhwk,bck->bhwc", uvs, colors)
    out = (1.0 - alpha_fg) * canvas + alpha_fg * stroke
    debug = {"colors": colors, "uvs": uvs, "canvas": canvas,
             "alpha_fg": alpha_fg}
    return out, debug



def _torgb_init(cfg: SynthesisConfig, key, in_ch):
    """ToRGBLayer ('orig') or ToRGBColorTriadLayer ('triad'/'canvas')."""
    k_affine, k_weight, k_caffine = jax.random.split(key, 3)
    out_ch = cfg.img_channels + cfg.torgb_extra_channels
    if cfg.color_format == "orig":
        return {
            "affine": fc_init(k_affine, cfg.w_dim, in_ch, bias_init=1.0),
            "weight": jax.random.normal(k_weight, (1, 1, in_ch, out_ch),
                                        jnp.float32),
            "bias": jnp.zeros((out_ch,), jnp.float32),
        }
    p = {
        "weight": jax.random.normal(k_weight, (1, 1, in_ch, out_ch),
                                    jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
        "color_bias": jnp.zeros((9,), jnp.float32),
    }
    if cfg.color_w_channels > 0:
        p["affine"] = fc_init(k_affine, cfg.w_dim, in_ch, bias_init=1.0)
        p["color_affine"] = fc_init(k_caffine, cfg.color_w_channels, 9,
                                    bias_init=0.0)
    else:
        p["affine"] = fc_init(k_affine, cfg.w_dim, in_ch + 9, bias_init=1.0)
    return p


def _torgb_apply(cfg: SynthesisConfig, params, x, w):
    """Returns (img, debug_data)."""
    in_ch = params["weight"].shape[2]
    weight_gain = 1.0 / math.sqrt(in_ch)  # 1x1 kernel
    w32 = w.astype(jnp.float32)

    if cfg.color_format == "orig":
        styles = fc_apply(params["affine"], w32) * weight_gain
        x = modulated_conv2d(x, params["weight"], styles, demodulate=False)
        x = bias_act(x, params["bias"].astype(x.dtype), dim=-1,
                     clamp=cfg.conv_clamp)
        return x, {}

    if cfg.color_w_channels > 0:
        styles = fc_apply(params["affine"], w32) * weight_gain
        colors = fc_apply(params["color_affine"],
                          w32[..., :cfg.color_w_channels])
    else:
        scaled = fc_apply(params["affine"], w32)
        colors = scaled[:, 0:9]
        styles = scaled[:, 9:] * weight_gain

    colors = bias_act(colors, params["color_bias"], dim=-1, act="tanh")
    colors = colors.reshape((-1, 3, 3))  # [B, rgb, (u,v,s)]

    x = modulated_conv2d(x, params["weight"], styles, demodulate=False)
    x = bias_act(x, params["bias"].astype(x.dtype), dim=-1,
                 clamp=cfg.conv_clamp)
    x = x.astype(jnp.float32)

    debug = {"colors": colors}
    uvs = jax.nn.softmax(x[..., :3], axis=-1)          # [B, H, W, 3]
    debug["uvs"] = uvs

    # stroke[b,h,w,c] = sum_k uvs[b,h,w,k] * colors[b,c,k]
    stroke = jnp.einsum("bhwk,bck->bhwc", uvs, colors)
    if cfg.color_format == "triad":
        out = stroke
    else:  # canvas
        canvas = x[..., 3:6]
        alpha = jax.nn.softmax(x[..., 6:8], axis=-1)
        debug["canvas"] = canvas
        debug["alpha_fg"] = alpha[..., :1]
        debug["alpha"] = alpha
        out = alpha[..., :1] * stroke + alpha[..., 1:] * canvas
    return out, debug


# ---------------------------------------------------------------------------
# SynthesisBlock + SynthesisNetwork
# ---------------------------------------------------------------------------

def synthesis_init(cfg: SynthesisConfig, key):
    """Returns (params, noise) where noise is a flat dict of noise textures
    keyed 'b{res}.conv{i}.noise_const' (reference buffer naming)."""
    params = {}
    noise = {}
    for res in cfg.block_resolutions:
        key, k0, k1, kt, kc = jax.random.split(key, 5)
        in_ch = cfg.block_in_channels(res)
        out_ch = cfg.channels(res)
        block = {}
        if res == 4:
            block["const"] = jax.random.normal(kc, (4, 4, out_ch), jnp.float32)
        else:
            block["conv0"] = _synthesis_layer_init(k0, in_ch, out_ch,
                                                   cfg.w_dim)
            noise[f"b{res}.conv0.noise_const"] = jax.random.normal(
                k0, (res, res), jnp.float32)
        block["conv1"] = _synthesis_layer_init(k1, out_ch, out_ch, cfg.w_dim)
        noise[f"b{res}.conv1.noise_const"] = jax.random.normal(
            k1, (res, res), jnp.float32)
        if cfg.block_has_torgb(res):
            block["torgb"] = _torgb_init(cfg, kt, out_ch)
        params[f"b{res}"] = block
    return params, noise


def synthesis_apply(cfg: SynthesisConfig, params, ws, geom_features=(), *,
                    noise: Optional[Dict] = None,
                    noise_buffers: Optional[Dict] = None,
                    positions=None,
                    pos_encoding: Optional[Sequence] = None,
                    noise_mode: str = "const",
                    rng=None,
                    return_debug_data: bool = False,
                    return_features: Tuple[int, ...] = (),
                    blended_features: Optional[Dict] = None,
                    force_fp32: bool = False):
    """Run the synthesis trunk.

    Args:
      ws: ``[B, num_ws, w_dim]`` styles.
      geom_features: list of ``[B, h_i, w_i, c_i]`` geometry feature maps, one
        per entry of ``cfg.geom_feature_resolutions`` (NHWC).
      noise: default per-layer noise textures from :func:`synthesis_init`.
      noise_buffers: optional per-style overrides, same key format.
      positions: ``[B, 2]`` int (y, x) canvas positions for noise wrapping.
      pos_encoding: list of ``[B, h, w, c]`` positional encodings per entry of
        ``cfg.pos_encoding_resolutions``.
      noise_mode: 'const' | 'random' | 'none'.
      rng: PRNG key (required for noise_mode='random').
      return_features: trunk resolutions whose features to export.
      blended_features: {res: (features, alpha)} -- features ``[B,h,w,c]`` and
        blend weight ``alpha`` ``[B,h,w,1]``; trunk features are replaced by
        ``alpha*features + (1-alpha)*x`` (reference stitching.BlendedFeatures).

    Returns:
      img or (img, debug_data) when debug/feature outputs were requested.
    """
    noise = noise or {}
    noise_buffers = noise_buffers or {}
    blended_features = blended_features or {}
    assert noise_mode in ("const", "random", "none")

    # Split ws per block: block i consumes num_conv ws (+1 for its torgb,
    # shared with the next block's first w in skip mode).
    ws = ws.astype(jnp.float32)
    block_ws = {}
    w_idx = 0
    for res in cfg.block_resolutions:
        n = cfg.block_num_conv(res) + (1 if cfg.block_has_torgb(res) else 0)
        block_ws[res] = ws[:, w_idx:w_idx + n]
        w_idx += cfg.block_num_conv(res)

    debug = {}
    x = None
    img = None
    geo_idx = 0
    pos_idx = 0
    b = ws.shape[0]
    last_res = cfg.block_resolutions[-1]

    for res in cfg.block_resolutions:
        bp = params[f"b{res}"]
        cur_ws = block_ws[res]
        dtype = jnp.float32 if force_fp32 else cfg.block_dtype(res)
        w_i = 0

        def layer_noise(name):
            key = f"b{res}.{name}.noise_const"
            if key in noise_buffers:
                return None, noise_buffers[key]
            return noise.get(key), None

        if res == 4:
            x = jnp.broadcast_to(bp["const"].astype(dtype)[None],
                                 (b, 4, 4, bp["const"].shape[-1]))
        else:
            x = x.astype(dtype)
            nc, ni = layer_noise("conv0")
            if rng is not None:
                rng, sub = jax.random.split(rng)
            else:
                sub = None
            x = _synthesis_layer_apply(
                cfg, bp["conv0"], x, cur_ws[:, w_i], resolution=res, up=2,
                noise_mode=noise_mode, noise_const=nc, input_noise=ni,
                positions=positions, rng=sub)
            w_i += 1

        nc, ni = layer_noise("conv1")
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        x = _synthesis_layer_apply(
            cfg, bp["conv1"], x, cur_ws[:, w_i], resolution=res, up=1,
            noise_mode=noise_mode, noise_const=nc, input_noise=ni,
            positions=positions, rng=sub)
        w_i += 1

        if img is not None:
            img = upsample2d(img, cfg.resample_filter)
        if cfg.block_has_torgb(res):
            y, tdebug = _torgb_apply(cfg, bp["torgb"], x, cur_ws[:, -1])
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
            if res == last_res:
                debug.update(tdebug)

        if res in return_features:
            debug[f"features{res}_preblend"] = x

        if res in blended_features:
            feats, alpha = blended_features[res]
            x = (alpha * feats.astype(jnp.float32)
                 + (1.0 - alpha) * x.astype(jnp.float32)).astype(x.dtype)
            if res == last_res:
                img, tdebug = _torgb_apply(cfg, bp["torgb"], x, cur_ws[:, -1])
                debug.update(tdebug)

        if res in return_features:
            debug[f"features{res}"] = x

        # Geometry / positional-encoding injection for the next block.
        block_geom = None
        if res in cfg.geom_feature_resolutions:
            block_geom = geom_features[geo_idx].astype(x.dtype)
            geo_idx += 1
        if res in cfg.pos_encoding_resolutions:
            enc = pos_encoding[pos_idx].astype(x.dtype)
            pos_idx += 1
            mode = cfg.pos_encoding_injection_mode
            if mode == "cat":
                x = jnp.concatenate([x, enc], axis=-1)
            elif mode == "add":
                if enc.shape[-1] == x.shape[-1]:
                    x = x + enc
                elif block_geom is not None and \
                        enc.shape[-1] == block_geom.shape[-1]:
                    block_geom = block_geom + enc
                elif block_geom is not None and \
                        enc.shape[-1] == block_geom.shape[-1] + x.shape[-1]:
                    x = jnp.concatenate([x, block_geom], axis=-1) + enc
                    block_geom = None
                else:
                    raise ValueError("pos-encoding channel mismatch for add")
            else:
                raise ValueError(f"unknown injection mode {mode}")
        if block_geom is not None:
            x = jnp.concatenate([x, block_geom], axis=-1)

    if return_debug_data or return_features:
        return img, debug
    return img
