"""Checkpoint conversion tests: layout transforms verified against torch
(CPU) as an independent oracle, plus native-bundle round trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.models.layers import fc_apply
from brushstroke_engine_tpu.models.geo_encoder import _conv_transpose
from brushstroke_engine_tpu.ops import conv2d_resample
from brushstroke_engine_tpu.utils import checkpoint as ckpt
from brushstroke_engine_tpu.utils import torch_extract as tx
from tests.helpers import small_bundle, make_engine

torch = pytest.importorskip("torch")

RNG = np.random.RandomState(0)


class TestLayoutParity:
    def test_fc_conversion_matches_torch(self):
        w = RNG.randn(6, 10).astype(np.float32)   # torch [out, in]
        b = RNG.randn(6).astype(np.float32)
        x = RNG.randn(3, 10).astype(np.float32)
        # Reference FullyConnectedLayer: y = x @ (w * gain).T + b, gain=1/sqrt(in)
        gain = np.float32(1.0 / np.sqrt(10))
        want = torch.nn.functional.linear(
            torch.from_numpy(x), torch.from_numpy(w * gain),
            torch.from_numpy(b)).numpy()
        params = ckpt.fc_from_torch({"fc.weight": w, "fc.bias": b}, "fc")
        got = np.asarray(fc_apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_conv_conversion_matches_torch(self):
        w = RNG.randn(5, 3, 3, 3).astype(np.float32)  # OIHW
        x = RNG.randn(2, 3, 8, 8).astype(np.float32)  # NCHW
        want = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
        x_nhwc = np.transpose(x, (0, 2, 3, 1))
        got = np.asarray(conv2d_resample(jnp.asarray(x_nhwc),
                                         jnp.asarray(ckpt.conv_from_torch(w)),
                                         padding=1))
        np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                                   rtol=1e-4, atol=1e-4)

    def test_convtranspose_conversion_matches_torch(self):
        w = RNG.randn(4, 6, 3, 3).astype(np.float32)  # torch IOHW
        b = RNG.randn(6).astype(np.float32)
        x = RNG.randn(1, 4, 8, 8).astype(np.float32)
        want = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=2, padding=1, output_padding=1).numpy()
        params = {"weight": jnp.asarray(ckpt.convtranspose_from_torch(w)),
                  "bias": jnp.asarray(b)}
        x_nhwc = np.transpose(x, (0, 2, 3, 1))
        got = np.asarray(_conv_transpose(params, jnp.asarray(x_nhwc),
                                         stride=2, pad=1, output_padding=1))
        np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                                   rtol=1e-4, atol=1e-4)

    def test_epilogue_fc_permutation(self):
        c, r = 5, 4
        w = RNG.randn(7, c * r * r).astype(np.float32)  # torch [out, C*H*W]
        x = RNG.randn(2, c, r, r).astype(np.float32)
        want = torch.from_numpy(x).flatten(1).numpy() @ w.T
        w_ours = ckpt.epilogue_fc_from_torch(w, channels=c, res=r)  # [in,out]
        x_nhwc = np.transpose(x, (0, 2, 3, 1)).reshape(2, -1)
        got = x_nhwc @ w_ours
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestGeneratorConversion:
    def _fake_torch_state(self, cfg, params, state):
        """Inverse-map our params into reference torch naming/layout."""
        flat = {}
        for i in range(cfg.mapping_layers):
            p = params["mapping"][f"fc{i}"]
            flat[f"mapping.fc{i}.weight"] = np.asarray(p["weight"]).T
            flat[f"mapping.fc{i}.bias"] = np.asarray(p["bias"])
        flat["mapping.w_avg"] = np.zeros(cfg.w_dim, np.float32)
        for res in cfg.synthesis.block_resolutions:
            bp = params["synthesis"][f"b{res}"]
            b = f"synthesis.b{res}"
            if res == 4:
                flat[f"{b}.const"] = np.transpose(
                    np.asarray(bp["const"]), (2, 0, 1))
            for conv in (["conv1"] if res == 4 else ["conv0", "conv1"]):
                cp = bp[conv]
                flat[f"{b}.{conv}.affine.weight"] = \
                    np.asarray(cp["affine"]["weight"]).T
                flat[f"{b}.{conv}.affine.bias"] = \
                    np.asarray(cp["affine"]["bias"])
                flat[f"{b}.{conv}.weight"] = np.transpose(
                    np.asarray(cp["weight"]), (3, 2, 0, 1))
                flat[f"{b}.{conv}.bias"] = np.asarray(cp["bias"])
                flat[f"{b}.{conv}.noise_strength"] = \
                    np.asarray(cp["noise_strength"])
                flat[f"{b}.{conv}.noise_const"] = np.asarray(
                    state["noise"][f"b{res}.{conv}.noise_const"])
            if "torgb" in bp:
                tp = bp["torgb"]
                flat[f"{b}.torgb.affine.weight"] = \
                    np.asarray(tp["affine"]["weight"]).T
                flat[f"{b}.torgb.affine.bias"] = \
                    np.asarray(tp["affine"]["bias"])
                flat[f"{b}.torgb.weight"] = np.transpose(
                    np.asarray(tp["weight"]), (3, 2, 0, 1))
                flat[f"{b}.torgb.bias"] = np.asarray(tp["bias"])
                if "color_bias" in tp:
                    flat[f"{b}.torgb.color_bias"] = \
                        np.asarray(tp["color_bias"])
        return flat

    def test_roundtrip_and_config_inference(self):
        bundle = small_bundle()
        cfg = bundle.gen_cfg
        flat = self._fake_torch_state(cfg, bundle.gen_params,
                                      bundle.gen_state)
        inferred = ckpt.infer_generator_config(
            flat, {"color_format": "triad"})
        assert inferred.img_resolution == cfg.img_resolution
        assert inferred.z_dim == cfg.z_dim
        assert inferred.synthesis.geom_feature_resolutions == \
            cfg.synthesis.geom_feature_resolutions
        assert inferred.synthesis.geom_feature_channels == \
            cfg.synthesis.geom_feature_channels
        assert inferred.num_ws == cfg.num_ws

        params2, state2 = ckpt.convert_generator_state(flat, inferred)
        for (p1, p2) in zip(
                jax.tree_util.tree_leaves(bundle.gen_params),
                jax.tree_util.tree_leaves(params2)):
            np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                       atol=1e-6)
        for k, v in bundle.gen_state["noise"].items():
            np.testing.assert_allclose(np.asarray(v),
                                       np.asarray(state2["noise"][k]))


class TestNativeBundle:
    def test_save_load_render_identical(self, tmp_path):
        bundle = small_bundle()
        p = str(tmp_path / "bundle.pkl")
        ckpt.save_native(p, bundle)
        loaded = ckpt.load_native(p)
        assert loaded.gen_cfg == bundle.gen_cfg
        assert loaded.enc_cfg == bundle.enc_cfg

        from brushstroke_engine_tpu.engine.brush import (
            PaintEngineFactory, GanBrushOptions,
        )
        eng = PaintEngineFactory.create(p)
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(11), 11)
        patch = np.zeros((eng.patch_width, eng.patch_width, 4), np.uint8)
        patch[8:24, 8:24, 3] = 255
        img, _ = eng.render_stroke(patch, None, opts)

        eng2 = make_engine(bundle)
        img2, _ = eng2.render_stroke(patch, None, opts)
        np.testing.assert_array_equal(img, img2)

    def test_factory_mock_without_checkpoint(self):
        from brushstroke_engine_tpu.engine.brush import (
            PaintEngineFactory, MockPaintEngine,
        )
        eng = PaintEngineFactory.create(None)
        assert isinstance(eng, MockPaintEngine)


class TestStubUnpickler:
    def test_persistent_stub_extraction(self, tmp_path):
        """Simulate the persistence pickle structure: an object whose state
        carries nested _modules/_parameters dicts."""
        import pickle

        class FakeReduce:
            def __reduce__(self):
                meta = {
                    "type": "class",
                    "state": {
                        "_parameters": {"weight": torch.randn(3, 2)},
                        "_buffers": {},
                        "_modules": {
                            "sub": {
                                "_parameters": {"bias": torch.randn(3)},
                                "_buffers": {"running": torch.zeros(3)},
                                "_modules": {},
                            },
                        },
                    },
                }
                return (_fake_reconstruct, (meta,))

        # Register a fake torch_utils.persistence module so pickling
        # produces the same GLOBAL reference a real snapshot contains.
        import sys
        import types
        mod = types.ModuleType("torch_utils.persistence")
        mod._reconstruct_persistent_obj = _fake_reconstruct
        pkg = types.ModuleType("torch_utils")
        pkg.persistence = mod
        sys.modules["torch_utils"] = pkg
        sys.modules["torch_utils.persistence"] = mod
        try:
            p = str(tmp_path / "fake.pkl")
            with open(p, "wb") as f:
                pickle.dump({"G_ema": FakeReduce(), "args": {"x": 1}}, f)
        finally:
            del sys.modules["torch_utils"]
            del sys.modules["torch_utils.persistence"]

        loaded = tx.load_reference_pickle(p)
        flat = tx.flatten_module_state(loaded["G_ema"])
        assert set(flat) == {"weight", "sub.bias", "sub.running"}
        assert flat["weight"].shape == (3, 2)


def _fake_reconstruct(meta):
    # Stand-in for torch_utils.persistence._reconstruct_persistent_obj; the
    # unpickler must intercept by *name* regardless of module.
    raise RuntimeError("should have been intercepted")


# Make the pickle reference resolvable under the reference's module path.
_fake_reconstruct.__module__ = "torch_utils.persistence"
_fake_reconstruct.__qualname__ = "_reconstruct_persistent_obj"


class TestTFLegacyConversion:
    """TF-legacy StyleGAN2 pickle ingestion (reference legacy.py:109-205):
    synthetic TF-layout params built by inverting the documented mapping
    must convert to exactly the same trees as the torch-layout path."""

    def _torch_flat_from_params(self, cfg, params, state):
        """Our params -> torch-name flat map (orig format, skip arch)."""
        flat = {}
        for i in range(cfg.mapping_layers):
            p = params["mapping"][f"fc{i}"]
            flat[f"mapping.fc{i}.weight"] = np.asarray(p["weight"]).T
            flat[f"mapping.fc{i}.bias"] = np.asarray(p["bias"])
        flat["mapping.w_avg"] = np.zeros(cfg.w_dim, np.float32)
        for res in cfg.synthesis.block_resolutions:
            bp = params["synthesis"][f"b{res}"]
            b = f"synthesis.b{res}"
            if res == 4:
                flat[f"{b}.const"] = np.transpose(
                    np.asarray(bp["const"]), (2, 0, 1))
            for conv in (["conv1"] if res == 4 else ["conv0", "conv1"]):
                cp = bp[conv]
                flat[f"{b}.{conv}.affine.weight"] = \
                    np.asarray(cp["affine"]["weight"]).T
                flat[f"{b}.{conv}.affine.bias"] = \
                    np.asarray(cp["affine"]["bias"])
                flat[f"{b}.{conv}.weight"] = np.transpose(
                    np.asarray(cp["weight"]), (3, 2, 0, 1))
                flat[f"{b}.{conv}.bias"] = np.asarray(cp["bias"])
                flat[f"{b}.{conv}.noise_strength"] = \
                    np.asarray(cp["noise_strength"])
                flat[f"{b}.{conv}.noise_const"] = np.asarray(
                    state["noise"][f"b{res}.{conv}.noise_const"])
            if "torgb" in bp:
                tp = bp["torgb"]
                flat[f"{b}.torgb.affine.weight"] = \
                    np.asarray(tp["affine"]["weight"]).T
                flat[f"{b}.torgb.affine.bias"] = \
                    np.asarray(tp["affine"]["bias"])
                flat[f"{b}.torgb.weight"] = np.transpose(
                    np.asarray(tp["weight"]), (3, 2, 0, 1))
                flat[f"{b}.torgb.bias"] = np.asarray(tp["bias"])
        return flat

    def _tf_params_from_torch_flat(self, flat, cfg):
        """Invert the legacy.py mapping: torch names -> TF variable names."""
        import math as m
        tf = {}
        tf["dlatent_avg"] = flat["mapping.w_avg"]
        for i in range(cfg.mapping_layers):
            tf[f"mapping/Dense{i}/weight"] = flat[f"mapping.fc{i}.weight"].T
            tf[f"mapping/Dense{i}/bias"] = flat[f"mapping.fc{i}.bias"]
        tf["synthesis/4x4/Const/const"] = flat["synthesis.b4.const"][None]

        def put(dst_tf, src_torch, noise_idx=None, flip=False):
            w = np.transpose(flat[f"{src_torch}.weight"], (2, 3, 1, 0))
            if flip:
                w = w[::-1, ::-1]
            tf[f"{dst_tf}/weight"] = np.ascontiguousarray(w)
            tf[f"{dst_tf}/bias"] = flat[f"{src_torch}.bias"]
            tf[f"{dst_tf}/mod_weight"] = \
                flat[f"{src_torch}.affine.weight"].T
            tf[f"{dst_tf}/mod_bias"] = \
                flat[f"{src_torch}.affine.bias"] - 1
            if noise_idx is not None:
                tf[f"{dst_tf}/noise_strength"] = \
                    flat[f"{src_torch}.noise_strength"]
                tf[f"synthesis/noise{noise_idx}"] = \
                    flat[f"{src_torch}.noise_const"][None, None]

        put("synthesis/4x4/Conv", "synthesis.b4.conv1", noise_idx=0)
        for res in cfg.synthesis.block_resolutions:
            n = int(m.log2(res))
            if res > 4:
                put(f"synthesis/{res}x{res}/Conv0_up",
                    f"synthesis.b{res}.conv0", noise_idx=2 * n - 5,
                    flip=True)
                put(f"synthesis/{res}x{res}/Conv1",
                    f"synthesis.b{res}.conv1", noise_idx=2 * n - 4)
            if f"synthesis.b{res}.torgb.weight" in flat:
                put(f"synthesis/{res}x{res}/ToRGB",
                    f"synthesis.b{res}.torgb")
        return tf

    def test_tf_pickle_roundtrip(self, tmp_path):
        import jax
        from brushstroke_engine_tpu.models.generator import (
            make_generator_config, generator_init,
        )
        cfg = make_generator_config(
            z_dim=8, w_dim=8, img_resolution=16, color_format="orig",
            architecture="skip", channel_base=64, channel_max=16,
            mapping_layers=2)
        params, state = generator_init(cfg, jax.random.PRNGKey(0))
        state = dict(state, w_avg=jnp.zeros(cfg.w_dim))
        flat = self._torch_flat_from_params(cfg, params, state)
        tf_params = self._tf_params_from_torch_flat(flat, cfg)

        # Pickle as a (G, D, Gs) tuple of fake tflib Networks.
        import sys
        import types
        import pickle as pkl_mod

        net_state = {
            "version": 4,
            "static_kwargs": {
                "latent_size": 8, "dlatent_size": 8, "resolution": 16,
                "num_channels": 3, "mapping_layers": 2, "fmap_base": 32,
                "fmap_max": 16, "architecture": "skip", "conv_clamp": 256,
            },
            "components": {},
            "variables": list(tf_params.items()),
        }

        class FakeNetwork:
            def __reduce__(self):
                return (_tf_reconstruct, (net_state,))

        mod = types.ModuleType("dnnlib.tflib.network")
        mod.Network = _tf_reconstruct
        pkg = types.ModuleType("dnnlib")
        tfl = types.ModuleType("dnnlib.tflib")
        sys.modules["dnnlib"] = pkg
        sys.modules["dnnlib.tflib"] = tfl
        sys.modules["dnnlib.tflib.network"] = mod
        try:
            p = str(tmp_path / "tf-network.pkl")
            with open(p, "wb") as f:
                pkl_mod.dump((FakeNetwork(), FakeNetwork(), FakeNetwork()),
                             f)
        finally:
            for k in ("dnnlib", "dnnlib.tflib", "dnnlib.tflib.network"):
                del sys.modules[k]

        got_cfg, got_params, got_state = ckpt.convert_tf_generator_pkl(p)
        assert got_cfg.img_resolution == 16
        assert got_cfg.synthesis.architecture == "skip"
        assert got_cfg.synthesis.color_format == "orig"
        assert got_cfg.num_ws == cfg.num_ws

        want_params, want_state = ckpt.convert_generator_state(flat, cfg)
        for a, b in zip(jax.tree_util.tree_leaves(want_params),
                        jax.tree_util.tree_leaves(got_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        for k, v in want_state["noise"].items():
            np.testing.assert_array_equal(np.asarray(v),
                                          got_state["noise"][k])

        # Converted generator runs end-to-end (orig skip trunk).
        from brushstroke_engine_tpu.models.generator import generator_apply
        z = jnp.asarray(np.random.RandomState(0).randn(2, 8), jnp.float32)
        img, _, _ = generator_apply(got_cfg, got_params, got_state, z=z,
                                    noise_mode="const")
        assert img.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(img)).all()


def _tf_reconstruct(state):
    # Stand-in global for dnnlib.tflib.network.Network; the stub unpickler
    # must replace it with a passive record.
    raise RuntimeError("should have been intercepted")


_tf_reconstruct.__module__ = "dnnlib.tflib.network"
_tf_reconstruct.__qualname__ = "Network"
