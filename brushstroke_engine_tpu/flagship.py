"""Flagship model configuration: the canonical NeuBE brush engine.

Mirrors the reference's shipped configuration (train_flags.txt: output
resolution 128, channel_max 128, z = w = 64, geometry injection at encoder
resolutions 0,1 with the default 'sauto' encoder) plus the 256px engine
variant used for high-resolution painting (reference brush.py:633 --
patch_width = G.img_resolution, shipped engines use 128 or 256).
"""

from __future__ import annotations

import jax

from brushstroke_engine_tpu.models.generator import (
    GeneratorConfig, make_generator_config, generator_init,
)
from brushstroke_engine_tpu.models.geo_encoder import (
    GeoEncoderConfig, geo_encoder_init,
)
from brushstroke_engine_tpu.models.discriminator import DiscriminatorConfig
from brushstroke_engine_tpu.utils.checkpoint import EngineBundle


def flagship_encoder_config() -> GeoEncoderConfig:
    return GeoEncoderConfig(
        kind="sauto", in_channels=1, out_channels=1, preproc="-11inverse",
        pre_filters=64, down_filters=(128, 256, 256), post_filters=(32, 16),
        up_filters=(256, 128, 64))


def flagship_generator_config(img_resolution: int = 128,
                              inject_res=(0, 1),
                              num_bf16_res: int = 0) -> GeneratorConfig:
    enc = flagship_encoder_config()
    geom_res = tuple(enc.featuremap_resolution(img_resolution, r)
                     for r in inject_res)
    geom_ch = tuple(enc.feature_channels(r) for r in inject_res)
    return make_generator_config(
        z_dim=64, w_dim=64, img_resolution=img_resolution,
        geom_feature_resolutions=geom_res, geom_feature_channels=geom_ch,
        color_format="triad", channel_base=16384, channel_max=128,
        num_bf16_res=num_bf16_res)


def flagship_discriminator_config(img_resolution: int = 128,
                                  num_bf16_res: int = 0
                                  ) -> DiscriminatorConfig:
    # D sees only the 3-channel image; geometry conditions G, not D
    # (reference loss_modified.py run_D, loss_modified.py:101-106).
    # The reference 'auto' spec trains D with fp16 at the 4 highest
    # resolutions (train.py cfg specs); bf16 is the TPU analog.
    return DiscriminatorConfig(
        c_dim=0, img_resolution=img_resolution, img_channels=3,
        channel_base=16384, channel_max=128, num_bf16_res=num_bf16_res)


def flagship_bundle(img_resolution: int = 128, seed: int = 0,
                    inject_res=(0, 1),
                    num_bf16_res: int = 0) -> EngineBundle:
    key = jax.random.PRNGKey(seed)
    k_enc, k_gen = jax.random.split(key)
    enc_cfg = flagship_encoder_config()
    enc_params, enc_state = geo_encoder_init(enc_cfg, k_enc)
    gen_cfg = flagship_generator_config(img_resolution, inject_res,
                                        num_bf16_res=num_bf16_res)
    gen_params, gen_state = generator_init(gen_cfg, k_gen)
    return EngineBundle(
        gen_cfg=gen_cfg, gen_params=gen_params, gen_state=gen_state,
        enc_cfg=enc_cfg, enc_params=enc_params, enc_state=enc_state,
        color_format="triad", geom_inject_resolutions=tuple(inject_res))
