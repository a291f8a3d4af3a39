"""Shared test fixtures: small random engine bundles."""

import jax

from brushstroke_engine_tpu.models.generator import (
    make_generator_config, generator_init,
)
from brushstroke_engine_tpu.models.geo_encoder import (
    GeoEncoderConfig, geo_encoder_init,
)
from brushstroke_engine_tpu.utils.checkpoint import EngineBundle


def small_bundle(img_resolution=32, seed=0, color_format="triad",
                 inject_res=(0,)) -> EngineBundle:
    """A tiny random-init engine bundle for engine/serving tests.

    Geometry encoder: 2 downsampling layers so bottleneck = res/4; injection
    resolutions chosen to match the generator's trunk.
    """
    key = jax.random.PRNGKey(seed)
    enc_cfg = GeoEncoderConfig(
        kind="sauto", in_channels=1, out_channels=1, preproc="-11inverse",
        pre_filters=8, down_filters=(16, 16), post_filters=(8,),
        up_filters=(16, 8))
    enc_params, enc_state = geo_encoder_init(enc_cfg, key)

    # Feature resolutions in trunk pixels for the given inject indices.
    geom_res = tuple(enc_cfg.featuremap_resolution(img_resolution, r)
                     for r in inject_res)
    geom_ch = tuple(enc_cfg.feature_channels(r) for r in inject_res)

    gen_cfg = make_generator_config(
        z_dim=16, w_dim=16, img_resolution=img_resolution,
        geom_feature_resolutions=geom_res,
        geom_feature_channels=geom_ch,
        color_format=color_format,
        channel_base=2048, channel_max=32)
    gen_params, gen_state = generator_init(gen_cfg, key)

    return EngineBundle(
        gen_cfg=gen_cfg, gen_params=gen_params, gen_state=gen_state,
        enc_cfg=enc_cfg, enc_params=enc_params, enc_state=enc_state,
        color_format=color_format,
        geom_inject_resolutions=tuple(inject_res))


def make_engine(bundle: EngineBundle = None, **kw):
    from brushstroke_engine_tpu.engine.brush import (
        TriadGanPaintEngine, CanvasPaintEngine,
    )
    bundle = bundle or small_bundle(**kw)
    cls = TriadGanPaintEngine if bundle.color_format == "triad" \
        else CanvasPaintEngine
    return cls(bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
               bundle.enc_cfg, bundle.enc_params, bundle.enc_state,
               geom_inject_resolutions=bundle.geom_inject_resolutions)
