"""int8 quantized-inference path (ops/quant.py).

Verifies the dequantization algebra, the routing gate, and the
end-to-end quality bound of int8-vs-bf16 generator renders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brushstroke_engine_tpu.ops import quant
from brushstroke_engine_tpu.ops.conv import modulated_conv2d
from brushstroke_engine_tpu.ops.precision import precision_mode


def test_quantized_conv_matches_dequantized_float_conv():
    """int32-accumulated conv x scales == f32 conv of dequantized operands."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 5), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 5, 7), jnp.float32)
    y = quant.quantized_conv(x, w, ((1, 1), (1, 1)))

    s_x = np.max(np.abs(np.asarray(x)), axis=(1, 2, 3), keepdims=True) / 127.
    s_w = np.max(np.abs(np.asarray(w)), axis=(0, 1, 2), keepdims=True) / 127.
    xdq = np.round(np.asarray(x) / s_x) * s_x
    wdq = np.round(np.asarray(w) / s_w) * s_w
    want = jax.lax.conv_general_dilated(
        jnp.asarray(xdq), jnp.asarray(wdq), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_quantized_conv_error_bound():
    """Relative error of the quantized conv stays at 8-bit scale."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    exact = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    q = quant.quantized_conv(x, w, ((1, 1), (1, 1)))
    rel = float(jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact))
    assert rel < 0.02, rel


def test_gate_excludes_strided_dilated_grouped():
    x = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
    with quant.int8_inference():
        assert quant.quantizable(x, (1, 1), (1, 1), 1)
        assert not quant.quantizable(x, (2, 2), (1, 1), 1)
        assert not quant.quantizable(x, (1, 1), (2, 2), 1)
        assert not quant.quantizable(x, (1, 1), (1, 1), 4)
        assert not quant.quantizable(jnp.zeros((1, 8, 8, 4), jnp.int8),
                                     (1, 1), (1, 1), 1)
    assert not quant.quantizable(x, (1, 1), (1, 1), 1)  # flag off


def test_modulated_conv2d_int8_close_to_float():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 8, 8, 6), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 6, 9) * 0.2, jnp.float32)
    s = jnp.asarray(rng.rand(3, 6) + 0.5, jnp.float32)
    want = modulated_conv2d(x, w, s, padding=1)
    with quant.int8_inference():
        got = modulated_conv2d(x, w, s, padding=1)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert 0 < rel < 0.02, rel   # differs (really quantized) but tightly


def test_generator_render_int8_quality():
    """End-to-end: int8 render of the tiny flagship-shaped generator stays
    within painting-quality distance of the bf16 render."""
    from tests.helpers import small_bundle
    from brushstroke_engine_tpu.models.generator import generator_apply
    from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode

    b = small_bundle()
    rng = np.random.RandomState(3)
    geom = jnp.asarray((rng.rand(2, 32, 32, 1) > 0.5), jnp.float32)
    z = jnp.asarray(rng.randn(2, b.gen_cfg.z_dim), jnp.float32)
    feats = geo_encoder_encode(b.enc_cfg, b.enc_params, b.enc_state, geom,
                               res=list(b.geom_inject_resolutions))

    with precision_mode("fast"):
        img_f, dd_f, _ = generator_apply(
            b.gen_cfg, b.gen_params, b.gen_state, z=z, geom_features=feats,
            noise_mode="const", return_debug_data=True)
        with quant.int8_inference():
            img_q, dd_q, _ = generator_apply(
                b.gen_cfg, b.gen_params, b.gen_state, z=z,
                geom_features=feats, noise_mode="const",
                return_debug_data=True)

    a = np.asarray(img_f, np.float32)
    q = np.asarray(img_q, np.float32)
    assert np.all(np.isfinite(q))
    mse = float(np.mean((a - q) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))   # [-1,1] range -> peak 2
    assert psnr > 25.0, psnr
    # uvs stay a partition (sum ~1) under quantization.
    uvs_sum = np.asarray(jnp.sum(dd_q["uvs"], axis=-1))
    np.testing.assert_allclose(uvs_sum, 1.0, atol=0.05)


@pytest.mark.parametrize("up", [1, 2])
def test_flag_leaves_resampled_path_untouched(up):
    """up/down-sampling convs keep the float path (strided/dilated)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 4) * 0.3, jnp.float32)
    s = jnp.asarray(rng.rand(2, 4) + 0.5, jnp.float32)
    f = jnp.asarray([1., 3., 3., 1.])
    want = modulated_conv2d(x, w, s, up=up, padding=1 if up == 1 else 0,
                            resample_filter=f if up == 2 else None)
    with quant.int8_inference():
        got = modulated_conv2d(x, w, s, up=up, padding=1 if up == 1 else 0,
                               resample_filter=f if up == 2 else None)
    if up == 2:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    else:
        assert float(jnp.max(jnp.abs(got - want))) > 0


def test_static_calibration_matches_dynamic_quality():
    """Static-PTQ: calibrate eagerly, then the baked-constant-scale render
    stays close to BOTH the dynamic-int8 and the float render."""
    from tests.helpers import small_bundle
    from brushstroke_engine_tpu.models.generator import generator_apply
    from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode

    b = small_bundle()
    rng = np.random.RandomState(4)
    geom = jnp.asarray((rng.rand(2, 32, 32, 1) > 0.5), jnp.float32)
    z = jnp.asarray(rng.randn(2, b.gen_cfg.z_dim), jnp.float32)
    feats = geo_encoder_encode(b.enc_cfg, b.enc_params, b.enc_state, geom,
                               res=list(b.geom_inject_resolutions))

    def render():
        img, _, _ = generator_apply(
            b.gen_cfg, b.gen_params, b.gen_state, z=z, geom_features=feats,
            noise_mode="const")
        return np.asarray(img, np.float32)

    with precision_mode("fast"):
        img_f = render()
        with quant.calibration() as amax:
            render()
        assert len(amax) > 0
        scales = quant.calibrated_scales()
        assert len(scales) == len(amax) and min(scales) > 0
        with quant.static_scales(scales):
            img_s = jax.jit(
                lambda: generator_apply(
                    b.gen_cfg, b.gen_params, b.gen_state, z=z,
                    geom_features=feats, noise_mode="const")[0])()
        img_s = np.asarray(img_s, np.float32)

    assert np.all(np.isfinite(img_s))
    mse = float(np.mean((img_f - img_s) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > 25.0, psnr


def test_static_scales_exhaustion_raises():
    """A program with more quantizable sites than calibrated scales must
    fail loudly (shape/program mismatch), not silently misquantize."""
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).randn(3, 3, 4, 4) * 0.1,
                    jnp.float32)
    pad = [(1, 1), (1, 1)]
    with quant.static_scales([0.01]):
        quant.quantized_conv(x, w, pad)          # consumes the only scale
        with pytest.raises(RuntimeError, match="exhausted"):
            quant.quantized_conv(x, w, pad)


def test_engine_int8_serving_mode():
    """enable_int8_serving: calibrates, bakes scales into the engine's
    render traces, output stays within painting-quality distance of the
    bf16 render."""
    from tests.helpers import make_engine
    from brushstroke_engine_tpu.engine.brush import GanBrushOptions

    eng = make_engine()
    w = eng.patch_width
    patch = np.zeros((w, w, 4), np.uint8)
    patch[w // 4:-w // 4, w // 4:-w // 4, 3] = 255
    opts = GanBrushOptions()
    opts.set_style(eng.random_style(7), 7)

    with precision_mode("fast"):
        img_f, _ = eng.render_stroke(patch, None, opts)
        scales = eng.enable_int8_serving()
        assert len(scales) > 0 and min(scales) > 0
        img_q, _ = eng.render_stroke(patch, None, opts)

    a = img_f.astype(np.float32) / 255.0
    q = img_q.astype(np.float32) / 255.0
    # The int8 program must actually be a DIFFERENT executable than the
    # already-compiled bf16 one (quant_scales is a static jit arg; a
    # trace-time-only context would silently reuse the bf16 program
    # here).  Quantization noise guarantees a nonzero difference.
    assert np.any(img_q != img_f), "int8 render identical to bf16 -- " \
        "the quantized program was never compiled (jit cache reuse bug)"
    mse = float(np.mean((a - q) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 25.0, psnr
    # Disable restores the exact bf16 program (separate cache entry).
    eng._int8_scales = None
    img_back, _ = eng.render_stroke(patch, None, opts)
    np.testing.assert_array_equal(img_back, img_f)
