"""Shared equalized-learning-rate layers (StyleGAN2 style).

Functional re-implementations of the reference layer classes
(reference: thirdparty/stylegan2_ada_pytorch/training/networks.py:93-173).
Params are plain nested dicts; configs are passed explicitly.  Weights are
stored in JAX-native layouts: FC ``[in, out]``, conv ``[kh, kw, in, out]``
(the checkpoint converter transposes from torch's ``[out, in]`` / OIHW).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.ops import bias_act, conv2d_resample, activation_gain


def normalize_2nd_moment(x, axis=-1, eps=1e-8):
    """x * rsqrt(mean(x^2) + eps)  (reference networks.py:24-26)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True)
                             + eps)


def fc_init(key, in_features: int, out_features: int, lr_multiplier: float = 1.0,
            bias: bool = True, bias_init: float = 0.0):
    """Equalized-LR fully-connected layer params.

    Stored weight is ``randn / lr_multiplier`` and rescaled at apply time by
    ``lr_multiplier / sqrt(in)`` so the effective init is N(0, 1/in) while the
    optimizer sees an ``lr_multiplier``-scaled parameterization
    (reference networks.py:93-107).
    """
    w = jax.random.normal(key, (in_features, out_features),
                          jnp.float32) / lr_multiplier
    p = {"weight": w}
    if bias:
        p["bias"] = jnp.full((out_features,), float(bias_init), jnp.float32)
    return p


def fc_apply(params, x, activation: str = "linear", lr_multiplier: float = 1.0):
    in_features = params["weight"].shape[0]
    weight_gain = lr_multiplier / math.sqrt(in_features)
    w = params["weight"].astype(x.dtype) * weight_gain
    b = params.get("bias")
    if b is not None and lr_multiplier != 1.0:
        b = b * lr_multiplier
    from brushstroke_engine_tpu.ops.precision import conv_precision
    x = jnp.matmul(x, w, precision=conv_precision(x.dtype))
    return bias_act(x, None if b is None else b.astype(x.dtype),
                    dim=-1, act=activation)


def conv_layer_init(key, in_channels: int, out_channels: int, kernel_size: int,
                    bias: bool = True):
    """Equalized-LR conv layer params (reference Conv2dLayer, networks.py:127)."""
    w = jax.random.normal(
        key, (kernel_size, kernel_size, in_channels, out_channels), jnp.float32)
    p = {"weight": w}
    if bias:
        p["bias"] = jnp.zeros((out_channels,), jnp.float32)
    return p


def conv_layer_apply(params, x, *, activation: str = "linear", up: int = 1,
                     down: int = 1, resample_filter=None,
                     conv_clamp: float | None = None, gain: float = 1.0):
    kh, kw, in_ch, _ = params["weight"].shape
    weight_gain = 1.0 / math.sqrt(in_ch * kh * kw)
    w = params["weight"] * weight_gain
    b = params.get("bias")
    flip_weight = (up == 1)
    x = conv2d_resample(x, w.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=kh // 2, flip_weight=flip_weight)
    act_gain = activation_gain(activation) * gain
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    return bias_act(x, None if b is None else b.astype(x.dtype), dim=-1,
                    act=activation, gain=act_gain, clamp=act_clamp)
