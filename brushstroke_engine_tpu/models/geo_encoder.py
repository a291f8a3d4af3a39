"""Geometry (stroke) autoencoder: encodes a black-on-white stroke patch into
multi-resolution feature maps that condition the GAN trunk.

Functional rebuild of the reference autoencoders:
  * 'sauto' (forger/experimental/autoenc/simple_autoencoder.py) -- the shipped
    family; supports multi-resolution encoding by running partial decoder
    layers (decode_partial, simple_autoencoder.py:251-261).
  * 'conv'  (forger/experimental/autoenc/ae_conv.py) -- strided conv AE,
    bottleneck-resolution only.
Plus the preprocessing variants and postprocessing of the base class
(forger/experimental/autoenc/base.py:32-91).

BatchNorm is explicit: params hold scale/bias, state holds running
mean/var; ``train=True`` uses batch statistics and returns updated state.
All tensors NHWC.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Primitive blocks
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    """Xavier-normal conv init (reference factory.weight_init)."""
    fan_in, fan_out = cin * kh * kw, cout * kh * kw
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return {
        "weight": std * jax.random.normal(key, (kh, kw, cin, cout),
                                          jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _bn_init(c):
    params = {"scale": jnp.ones((c,), jnp.float32),
              "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)}
    return params, state


def _bn_apply(params, state, x, train: bool, momentum: float = 0.1,
              eps: float = 1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y, new_state


def _reflect_conv(params, x, stride: int = 1, pad: int = 1):
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode="reflect")
    from brushstroke_engine_tpu.ops.precision import conv_precision
    y = jax.lax.conv_general_dilated(
        x, params["weight"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=conv_precision(x.dtype),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32
        else None)
    return y + params["bias"]


def _conv_transpose(params, x, stride: int = 2, pad: int = 1,
                    output_padding: int = 1):
    """torch nn.ConvTranspose2d equivalent (weight stored HWIO [kh,kw,in,out])."""
    k = params["weight"].shape[0]
    w = params["weight"][::-1, ::-1]  # transpose conv convolves (flips) kernel
    lo = k - 1 - pad
    hi = k - 1 - pad + output_padding
    from brushstroke_engine_tpu.ops.precision import conv_precision
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=conv_precision(x.dtype),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32
        else None)
    return y + params["bias"]


def _lrelu(x, neg_slope: Optional[float]):
    return jax.nn.leaky_relu(x, 0.01 if neg_slope is None else neg_slope)


def upsample_bilinear_align_corners(x, factor: int = 2):
    """Bilinear x2 upsample with torch align_corners=True semantics.

    Implemented as two small dense interpolation matmuls (MXU-friendly) since
    jax.image.resize uses half-pixel centers which differ from align_corners.
    """
    b, h, w, c = x.shape

    def weights(n_in, n_out):
        if n_in == 1:
            return np.ones((n_out, 1), np.float32)
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (pos - lo).astype(np.float32)
        m = np.zeros((n_out, n_in), np.float32)
        m[np.arange(n_out), lo] += 1 - frac
        m[np.arange(n_out), hi] += frac
        return m

    wh = jnp.asarray(weights(h, h * factor)).astype(x.dtype)
    ww = jnp.asarray(weights(w, w * factor)).astype(x.dtype)
    from brushstroke_engine_tpu.ops.precision import conv_precision
    x = jnp.einsum("ih,bhwc->biwc", wh, x, precision=conv_precision(x.dtype))
    x = jnp.einsum("jw,bhwc->bhjc", ww, x, precision=conv_precision(x.dtype))
    return x


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GeoEncoderConfig:
    kind: str = "sauto"                  # 'sauto' | 'conv'
    in_channels: int = 1
    out_channels: int = 1                # decoder output channels (1 or 3)
    preproc: Optional[str] = "none"      # 'none' | 'inverse' | '-11inverse'
    # --- sauto ---
    pre_filters: int = 64
    down_filters: Tuple[int, ...] = (128, 256, 256)
    post_filters: Tuple[int, ...] = (32, 16)
    up_filters: Tuple[int, ...] = (256, 128, 64)
    decoder_pre_filters: int = -1
    neg_slope: Optional[float] = None    # None = legacy (conv-BN-act, slope .01)
    # --- conv ---
    img_width: int = 128
    emb_channel: int = 4
    channel_factor: int = 4
    num_layers: int = 4

    @property
    def batchnorm_after_activation(self) -> bool:
        return self.kind == "sauto" and self.neg_slope is not None

    @property
    def scale_up_v2(self) -> bool:
        return self.kind == "sauto" and self.neg_slope is not None

    def num_downsampling_layers(self) -> int:
        if self.kind == "sauto":
            return len(self.down_filters)
        return self.num_layers

    def feature_channels(self, res: int = 0) -> int:
        if self.kind == "sauto":
            channels = [self.post_filters[-1]] + list(self.up_filters)
            return channels[res]
        assert res == 0, "conv AE supports bottleneck resolution only"
        return self.emb_channel

    def featuremap_resolution(self, input_res: int, res: int = 0) -> int:
        enc_res = input_res // (2 ** self.num_downsampling_layers())
        return enc_res * (2 ** res)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _single_conv_init(key, cin, cout, k):
    kc, = jax.random.split(key, 1)
    conv = _conv_init(kc, k, k, cin, cout)
    bn_p, bn_s = _bn_init(cout)
    return {"conv": conv, "bn": bn_p}, {"bn": bn_s}


def geo_encoder_init(cfg: GeoEncoderConfig, key):
    params = {"encoder": {}, "decoder": {}}
    state = {"encoder": {}, "decoder": {}}

    if cfg.kind == "sauto":
        enc_plan = []  # (name, cin, cout, kernel, stride, pad)
        filters = ([cfg.pre_filters] if cfg.pre_filters > 0 else []) \
            + list(cfg.down_filters)
        if cfg.pre_filters > 0:
            enc_plan.append(("layer0", cfg.in_channels, filters[0], 7, 1, 3))
            prev = filters[0]
            rest = list(cfg.down_filters)
        else:
            prev = cfg.in_channels
            rest = list(cfg.down_filters)
        for i, f in enumerate(rest):
            enc_plan.append((f"layer{len(enc_plan)}", prev, f, 3, 2, 1))
            prev = f
        for f in cfg.post_filters:
            enc_plan.append((f"layer{len(enc_plan)}", prev, f, 3, 1, 1))
            prev = f
        for name, cin, cout, k, s, p in enc_plan:
            key, sub = jax.random.split(key)
            params["encoder"][name], state["encoder"][name] = \
                _single_conv_init(sub, cin, cout, k)

        # Decoder.
        dec_in = cfg.post_filters[-1]
        if cfg.decoder_pre_filters > 0:
            key, sub = jax.random.split(key)
            params["decoder"]["first"], state["decoder"]["first"] = \
                _single_conv_init(sub, dec_in, cfg.decoder_pre_filters, 3)
            prev = cfg.decoder_pre_filters
        else:
            prev = dec_in
        for i, f in enumerate(cfg.up_filters):
            key, sub = jax.random.split(key)
            params["decoder"][f"up{i}"], state["decoder"][f"up{i}"] = \
                _single_conv_init(sub, prev, f, 3)
            prev = f
        if cfg.out_channels != prev:
            key, sub = jax.random.split(key)
            params["decoder"]["final"] = _conv_init(sub, 1, 1, prev,
                                                    cfg.out_channels)
        return params, state

    # 'conv' AE (ae_conv.py).
    res_log2 = int(math.log2(cfg.img_width))
    enc_res = [2 ** i for i in range(res_log2,
                                     max(res_log2 - cfg.num_layers, 2), -1)]
    ch = {enc_res[i]: cfg.channel_factor * (2 ** i)
          for i in range(len(enc_res))}
    prev = cfg.in_channels
    for i, r in enumerate(enc_res):
        key, sub = jax.random.split(key)
        params["encoder"][f"layer{r}"], state["encoder"][f"layer{r}"] = \
            _single_conv_init(sub, prev, ch[r], 3)
        prev = ch[r]
    key, sub = jax.random.split(key)
    params["encoder"]["final"], state["encoder"]["final"] = \
        _single_conv_init(sub, prev, cfg.emb_channel, 3)

    dec_res = list(reversed(enc_res))
    dch = {dec_res[i]: cfg.channel_factor * 2 ** (cfg.num_layers - i - 1)
           for i in range(cfg.num_layers)}
    key, sub = jax.random.split(key)
    params["decoder"]["first"], state["decoder"]["first"] = \
        _single_conv_init(sub, cfg.emb_channel, dch[dec_res[0]], 3)
    for i, r in enumerate(dec_res):
        cin = dch[r]
        cout = dch[r * 2] if r < dec_res[-1] else cfg.out_channels
        key, sub = jax.random.split(key)
        params["decoder"][f"layer{r}"], state["decoder"][f"layer{r}"] = \
            _single_conv_init(sub, cin, cout, 3)
    return params, state


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _single_conv_apply(cfg, p, s, x, *, stride=1, pad=1, train=False,
                       transpose=False, legacy_order=None):
    """conv (+BN +LeakyReLU in config-dependent order)."""
    if transpose:
        x = _conv_transpose(p["conv"], x, stride=stride, pad=pad)
    else:
        x = _reflect_conv(p["conv"], x, stride=stride, pad=pad)
    after_act = cfg.batchnorm_after_activation if legacy_order is None \
        else legacy_order
    if after_act:
        x = _lrelu(x, cfg.neg_slope)
        x, bn_s = _bn_apply(p["bn"], s["bn"], x, train)
    else:
        x, bn_s = _bn_apply(p["bn"], s["bn"], x, train)
        x = _lrelu(x, cfg.neg_slope)
    return x, {"bn": bn_s}


def _encoder_forward(cfg, params, state, x, train):
    new_state = {}
    if cfg.kind == "sauto":
        names = sorted(params["encoder"].keys(),
                       key=lambda n: int(n.replace("layer", "")))
        n_pre = 1 if cfg.pre_filters > 0 else 0
        n_down = len(cfg.down_filters)
        for i, name in enumerate(names):
            stride = 2 if n_pre <= i < n_pre + n_down else 1
            pad = 3 if (i == 0 and n_pre) else 1
            x, new_state[name] = _single_conv_apply(
                cfg, params["encoder"][name], state["encoder"][name], x,
                stride=stride, pad=pad, train=train)
        return x, new_state
    # conv AE: strided layers then 'final'; order conv -> act -> BN.
    res_names = [n for n in params["encoder"] if n != "final"]
    res_names.sort(key=lambda n: -int(n.replace("layer", "")))
    for name in res_names:
        x, new_state[name] = _single_conv_apply(
            cfg, params["encoder"][name], state["encoder"][name], x,
            stride=2, pad=1, train=train, legacy_order=True)
    x, new_state["final"] = _single_conv_apply(
        cfg, params["encoder"]["final"], state["encoder"]["final"], x,
        stride=1, pad=1, train=train, legacy_order=True)
    return x, new_state


def _decoder_layers(cfg, params, state, x, nlayers, train):
    """Run the first ``nlayers`` decoder up-layers, returning intermediates."""
    new_state = {}
    results = []
    if "first" in params["decoder"]:
        x, new_state["first"] = _single_conv_apply(
            cfg, params["decoder"]["first"], state["decoder"]["first"], x,
            stride=1, pad=1, train=train,
            legacy_order=True if cfg.kind == "sauto" else None)
    for i in range(nlayers):
        name = f"up{i}"
        p, s = params["decoder"][name], state["decoder"][name]
        if cfg.scale_up_v2:
            x, new_state[name] = _single_conv_apply(
                cfg, p, s, x, stride=2, pad=1, train=train, transpose=True,
                legacy_order=True)
        else:
            x = upsample_bilinear_align_corners(x)
            x, new_state[name] = _single_conv_apply(
                cfg, p, s, x, stride=1, pad=1, train=train,
                legacy_order=False)
        results.append(jax.lax.stop_gradient(x))
    return x, results, new_state


def geo_encoder_encode(cfg: GeoEncoderConfig, params, state, geom,
                       res: Sequence[int] = (0,), train: bool = False):
    """Encode geometry into feature maps for the GAN.

    Args:
      geom: ``[B, H, W, 1]`` float, 0 = stroke (FG), 1 = background.
      res: resolutions to return (0 = bottleneck, 1 = one decoder layer up).

    Returns:
      list of ``[B, h_i, w_i, c_i]`` feature maps (stop-gradient applied to
      partial-decoder outputs like the reference decode_partial).
    """
    if isinstance(res, int):
        res = [res]
    x = preprocess(cfg, geom)

    # Production fast path: the conditioning encoder is frozen and never
    # differentiated, so run it in bf16 (inference BN is just scale/shift;
    # its features feed a generator that itself runs bf16 at the hot
    # resolutions).  'strict' mode keeps f32 for golden/checkpoint parity.
    from brushstroke_engine_tpu.ops.precision import get_precision_mode
    fast = (not train) and get_precision_mode() == "fast"
    if fast:
        def _cast(t):
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, t)
        params, state = _cast(params), _cast(state)
        x = x.astype(jnp.bfloat16)

    def _out(feats):
        return [f.astype(jnp.float32) for f in feats] if fast else feats

    encoding, _ = _encoder_forward(cfg, params, state, x, train)
    max_res = max(res)
    if cfg.kind == "conv":
        assert max_res == 0, "conv AE supports bottleneck resolution only"
        return _out([encoding])
    if max_res == 0:
        return _out([encoding])
    _, ups, _ = _decoder_layers(cfg, params, state, encoding, max_res, train)
    results = [encoding] + ups
    return _out([results[r] for r in res])


def geo_encoder_apply(cfg: GeoEncoderConfig, params, state, x,
                      train: bool = False, preprocess_input: bool = True):
    """Full autoencoder forward (for AE training / diagnostics).

    Returns (raw_reconstruction, new_state).
    """
    if preprocess_input:
        x = preprocess(cfg, x)
    new_state = {"encoder": {}, "decoder": {}}
    x, new_state["encoder"] = _encoder_forward(cfg, params, state, x, train)
    if cfg.kind == "sauto":
        nl = len(cfg.up_filters)
        x, _, dec_state = _decoder_layers(cfg, params, state, x, nl, train)
        new_state["decoder"] = dec_state
        if "final" in params["decoder"]:
            x = _reflect_conv(params["decoder"]["final"], x, stride=1, pad=0)
        return x, new_state
    # conv decoder.
    dec_state = {}
    x, dec_state["first"] = _single_conv_apply(
        cfg, params["decoder"]["first"], state["decoder"]["first"], x,
        stride=1, pad=1, train=train, legacy_order=True)
    res_names = [n for n in params["decoder"] if n.startswith("layer")]
    res_names.sort(key=lambda n: int(n.replace("layer", "")))
    for name in res_names:
        x, dec_state[name] = _single_conv_apply(
            cfg, params["decoder"][name], state["decoder"][name], x,
            stride=2, pad=1, train=train, transpose=True, legacy_order=True)
    new_state["decoder"] = dec_state
    return x, new_state


# ---------------------------------------------------------------------------
# Pre/post-processing (reference base.py:32-91)
# ---------------------------------------------------------------------------

def preprocess(cfg: GeoEncoderConfig, x):
    if cfg.preproc in (None, "none"):
        return x
    if cfg.preproc == "inverse":
        return 1.0 - x
    if cfg.preproc == "-11inverse":
        return (1.0 - x) * 2.0 - 1.0
    raise ValueError(f"unknown preprocessing {cfg.preproc!r}")


def preprocess_truth(cfg: GeoEncoderConfig, x):
    if (cfg.preproc is not None and "inverse" in cfg.preproc) \
            or cfg.out_channels == 3:
        return 1.0 - x
    return x


def postprocess(cfg: GeoEncoderConfig, y):
    """Raw decoder output -> [0,1] black-on-white reconstruction."""
    y = postprocess_partial(cfg, y)
    if cfg.out_channels == 1:
        y = jax.nn.sigmoid(y + 0.5)
    else:
        y = y[..., 1:]  # background channel (black-on-white default)
    if cfg.preproc is not None and "inverse" in cfg.preproc \
            and cfg.out_channels == 1:
        y = 1.0 - y
    return y


def postprocess_partial(cfg: GeoEncoderConfig, y):
    if cfg.out_channels == 1:
        return y
    if cfg.out_channels == 3:
        p = jax.nn.softmax(y, axis=-1)
        return jnp.concatenate(
            [jnp.sum(p[..., :2], axis=-1, keepdims=True), p[..., 2:]],
            axis=-1)
    raise ValueError(f"unsupported decoder channels {cfg.out_channels}")
