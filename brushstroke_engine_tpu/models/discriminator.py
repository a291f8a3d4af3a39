"""StyleGAN2 discriminator (resnet architecture).

Functional rebuild of the reference Discriminator stack
(reference: thirdparty/.../training/networks.py:789-1012): resnet blocks with
FIR-filtered downsampling, minibatch-stddev, epilogue FC, and optional label
conditioning via a (z_dim=0) mapping network.

In NeuBE training the discriminator input is the generated/real image
concatenated with the conditioning geometry channel(s), so ``img_channels``
should be set to 3 + geometry channels by the caller.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.ops import setup_filter
from brushstroke_engine_tpu.models.layers import (
    fc_init, fc_apply, conv_layer_init, conv_layer_apply,
)
from brushstroke_engine_tpu.models.mapping import (
    MappingConfig, mapping_init, mapping_apply,
)


@dataclass(frozen=True)
class DiscriminatorConfig:
    c_dim: int
    img_resolution: int
    img_channels: int
    architecture: str = "resnet"       # 'orig' | 'resnet' ('skip' unused here)
    channel_base: int = 16384
    channel_max: int = 128
    num_bf16_res: int = 0
    conv_clamp: Optional[float] = 256.0
    cmap_dim: Optional[int] = None
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    resample_taps: Tuple[int, ...] = (1, 3, 3, 1)

    @property
    def block_resolutions(self) -> Tuple[int, ...]:
        n = int(math.log2(self.img_resolution))
        return tuple(2 ** i for i in range(n, 2, -1))

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def cmap(self) -> int:
        if self.c_dim == 0:
            return 0
        return self.cmap_dim if self.cmap_dim is not None else self.channels(4)

    def block_dtype(self, res: int):
        bf16_res = max(2 ** (int(math.log2(self.img_resolution)) + 1
                             - self.num_bf16_res), 8)
        return jnp.bfloat16 if res >= bf16_res else jnp.float32

    @property
    def resample_filter(self):
        return setup_filter(list(self.resample_taps))


def discriminator_init(cfg: DiscriminatorConfig, key):
    params = {}
    for res in cfg.block_resolutions:
        key, k_rgb, k0, k1, ks = jax.random.split(key, 5)
        tmp = cfg.channels(res)
        out = cfg.channels(res // 2)
        block = {}
        if res == cfg.img_resolution:
            block["fromrgb"] = conv_layer_init(k_rgb, cfg.img_channels, tmp, 1)
        block["conv0"] = conv_layer_init(k0, tmp, tmp, 3)
        block["conv1"] = conv_layer_init(k1, tmp, out, 3)
        if cfg.architecture == "resnet":
            block["skip"] = conv_layer_init(ks, tmp, out, 1, bias=False)
        params[f"b{res}"] = block

    key, k_conv, k_fc, k_out, k_map = jax.random.split(key, 5)
    ch4 = cfg.channels(4)
    params["b4"] = {
        "conv": conv_layer_init(k_conv, ch4 + cfg.mbstd_num_channels, ch4, 3),
        "fc": fc_init(k_fc, ch4 * 16, ch4),
        "out": fc_init(k_out, ch4, 1 if cfg.cmap == 0 else cfg.cmap),
    }
    if cfg.c_dim > 0:
        mcfg = MappingConfig(z_dim=0, c_dim=cfg.c_dim, w_dim=cfg.cmap,
                             num_ws=None, w_avg_beta=None)
        params["mapping"], _ = mapping_init(mcfg, k_map)
    return params


def _minibatch_stddev(x, group_size: int, num_channels: int):
    """Reference MinibatchStdLayer (networks.py:873-894), NHWC."""
    n, h, w, c = x.shape
    g = min(group_size, n) if group_size is not None else n
    f = num_channels
    cc = c // f
    y = x.reshape(g, n // g, h, w, f, cc).astype(jnp.float32)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))                      # [n//g, F]
    y = jnp.tile(y[:, None, None, :], (g, h, w, 1)).reshape(n, h, w, f)
    return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


def discriminator_apply(cfg: DiscriminatorConfig, params, img, c=None,
                        force_fp32: bool = False):
    """Returns logits ``[B, 1]``.  img is NHWC in [-1, 1]-ish range."""
    f = cfg.resample_filter
    x = None
    for res in cfg.block_resolutions:
        bp = params[f"b{res}"]
        dtype = jnp.float32 if force_fp32 else cfg.block_dtype(res)
        if res == cfg.img_resolution:
            x = conv_layer_apply(bp["fromrgb"], img.astype(dtype),
                                 activation=cfg.activation,
                                 conv_clamp=cfg.conv_clamp)
        else:
            x = x.astype(dtype)
        if cfg.architecture == "resnet":
            y = conv_layer_apply(bp["skip"], x, down=2, resample_filter=f,
                                 gain=math.sqrt(0.5))
            x = conv_layer_apply(bp["conv0"], x, activation=cfg.activation,
                                 conv_clamp=cfg.conv_clamp)
            x = conv_layer_apply(bp["conv1"], x, activation=cfg.activation,
                                 down=2, resample_filter=f,
                                 conv_clamp=cfg.conv_clamp,
                                 gain=math.sqrt(0.5))
            x = y + x
        else:
            x = conv_layer_apply(bp["conv0"], x, activation=cfg.activation,
                                 conv_clamp=cfg.conv_clamp)
            x = conv_layer_apply(bp["conv1"], x, activation=cfg.activation,
                                 down=2, resample_filter=f,
                                 conv_clamp=cfg.conv_clamp)

    # Epilogue at 4x4 (reference networks.py:899-952).
    x = x.astype(jnp.float32)
    ep = params["b4"]
    if cfg.mbstd_num_channels > 0:
        x = _minibatch_stddev(x, cfg.mbstd_group_size, cfg.mbstd_num_channels)
    x = conv_layer_apply(ep["conv"], x, activation=cfg.activation,
                         conv_clamp=cfg.conv_clamp)
    # NHWC flatten differs from the reference's NCHW flatten in element order;
    # this only permutes the fc weight rows (the converter accounts for it).
    x = fc_apply(ep["fc"], x.reshape(x.shape[0], -1),
                 activation=cfg.activation)
    x = fc_apply(ep["out"], x)

    if cfg.cmap > 0:
        mcfg = MappingConfig(z_dim=0, c_dim=cfg.c_dim, w_dim=cfg.cmap,
                             num_ws=None, w_avg_beta=None)
        cmap, _ = mapping_apply(mcfg, params["mapping"], None, c)
        x = jnp.sum(x * cmap, axis=1, keepdims=True) / math.sqrt(cfg.cmap)
    return x
