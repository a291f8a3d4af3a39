"""Parity against the ACTUAL reference code running on CPU torch.

Every other parity test in this repo checks against goldens written here
from the documented math.  This module closes the loop (VERDICT r2 item 1):
it imports ``/root/reference`` itself (pure-torch op fallbacks,
``upfirdn2d.py:162-164``, ``bias_act.py:87-89``) and asserts that the JAX
rebuild matches the reference's own executable code:

  (a) op refs: ``_upfirdn2d_ref`` / ``_bias_act_ref`` / ``conv2d_resample``
      / ``modulated_conv2d`` (the executable spec of every compute op);
  (b) the full modified Generator forward (``networks_modified.py:228-401``):
      z path, ``forward_pre_mapped`` with noise buffers, and
      ``blended_features`` stitching injection;
  (c) the ``sauto`` geometry encoder (``simple_autoencoder.py:289-297``),
      through the real snapshot-pkl -> converter pipeline.

Loss-scalar and paint-engine parity live in TestForgerLossParity /
TestPaintEngineParity below.  All tests skip cleanly when the reference
tree is not present.
"""

import os
import pickle
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from brushstroke_engine_tpu import ops
from brushstroke_engine_tpu.models.generator import generator_apply
from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode
from brushstroke_engine_tpu.utils import checkpoint as ckpt

torch = pytest.importorskip("torch")

REF_ROOT = os.environ.get("NEUBE_REFERENCE", "/root/reference")
SG2 = os.path.join(REF_ROOT, "thirdparty", "stylegan2_ada_pytorch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SG2), reason="reference tree not available")


def _import_ref(name):
    """Import a module from the reference tree (path-injected, CPU only)."""
    for p in (SG2, REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib
    return importlib.import_module(name)


def _import_ref_stitching():
    """forger.train.stitching imports torchvision (not installed here); only
    its RandomStitcher paths touch it, so satisfy the import with an empty
    stub module."""
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "lpips" not in sys.modules:
        # forger.metrics.geom_metric imports lpips at module level but only
        # instantiates it inside the lpips-based metrics we don't exercise.
        lp = types.ModuleType("lpips")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("lpips package unavailable in this env")

        lp.LPIPS = _Unavailable
        sys.modules["lpips"] = lp
    return _import_ref("forger.train.stitching")


def _nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def _nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(np.asarray(x_nchw), (0, 2, 3, 1)))


# ---------------------------------------------------------------------------
# (a) Op-level parity against the reference's executable specs.
# ---------------------------------------------------------------------------

class TestOpParity:
    @pytest.mark.parametrize("up,down,padding", [
        (1, 1, 0), (2, 1, 1), (1, 2, 1), (2, 2, 2),
        (2, 1, (1, 2, 0, 3)), (1, 2, (-1, 2, 1, -1)), (1, 1, (2, 0, -1, 1)),
    ])
    @pytest.mark.parametrize("sep,flip,gain", [
        (False, False, 1.0), (True, True, 4.0),
    ])
    def test_upfirdn2d(self, up, down, padding, sep, flip, gain):
        ref = _import_ref("torch_utils.ops.upfirdn2d")
        rng = np.random.RandomState(0)
        x = rng.randn(2, 3, 12, 12).astype(np.float32)
        taps = rng.randn(4).astype(np.float32) if sep \
            else rng.randn(3, 4).astype(np.float32)
        want = ref.upfirdn2d(torch.from_numpy(x), torch.from_numpy(taps),
                             up=up, down=down, padding=padding,
                             flip_filter=flip, gain=gain).numpy()
        got = ops.upfirdn2d(jnp.asarray(_nhwc(x)), taps, up=up, down=down,
                            padding=padding, flip_filter=flip, gain=gain)
        np.testing.assert_allclose(_nchw(got), want, rtol=1e-5, atol=1e-5)

    def test_upfirdn2d_none_filter(self):
        ref = _import_ref("torch_utils.ops.upfirdn2d")
        rng = np.random.RandomState(1)
        x = rng.randn(1, 2, 7, 7).astype(np.float32)
        want = ref.upfirdn2d(torch.from_numpy(x), None, up=2, padding=1)
        got = ops.upfirdn2d(jnp.asarray(_nhwc(x)), None, up=2, padding=1)
        np.testing.assert_allclose(_nchw(got), want.numpy(),
                                   rtol=1e-6, atol=1e-6)

    def test_wrapped_noise_parity(self):
        """ops.wrapped_const_noise vs the reference's position-wrapped
        grid_sample (networks.py:295-299 create_sampling_grid + :373-381),
        including FRACTIONAL texel offsets where the bilinear '+1' tap can
        land on the last texel (the round-5 fix)."""
        nets = _import_ref("training.networks")
        rng = np.random.RandomState(3)
        for r_l, r_img, pos in [(8, 32, [[3, 17]]),
                                (16, 32, [[31, 5], [9, 30], [0, 0]]),
                                (32, 32, [[1, 2], [130, 77]])]:
            noise = rng.randn(r_l, r_l).astype(np.float32)
            positions = torch.tensor(pos, dtype=torch.int64)
            norm = (positions % r_img).float() / (r_img - 1)
            grid = nets.create_sampling_grid(r_l)
            g = ((grid + norm.unsqueeze(1).unsqueeze(1)) % 1) * 2 - 1
            want = torch.nn.functional.grid_sample(
                torch.from_numpy(noise)[None, None].expand(
                    len(pos), -1, -1, -1),
                g, padding_mode="reflection", align_corners=True)
            got = ops.wrapped_const_noise(
                jnp.asarray(noise), jnp.asarray(pos, jnp.int32), r_img)
            np.testing.assert_allclose(
                np.asarray(got)[..., 0], want[:, 0].numpy(),
                rtol=1e-4, atol=1e-5)

    def test_setup_filter(self):
        ref = _import_ref("torch_utils.ops.upfirdn2d")
        for taps, kw in [([1, 3, 3, 1], {}), ([1, 2, 1], {"gain": 4.0}),
                         (None, {}), ([[1, 2], [3, 4]], {"flip_filter": True}),
                         ([1, 3, 3, 1], {"separable": False})] :
            sep = kw.pop("separable", None)
            want = ref.setup_filter(taps, **kw, separable=sep)
            got = ops.setup_filter(taps, **kw)
            if want.ndim == 1:       # reference keeps separable filters 1D
                want = torch.outer(want, want)
            np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                       rtol=1e-6, atol=1e-6)

    def test_bias_act_all_activations(self):
        ref = _import_ref("torch_utils.ops.bias_act")
        rng = np.random.RandomState(2)
        x = rng.randn(3, 5, 4, 4).astype(np.float32) * 3
        b = rng.randn(5).astype(np.float32)
        assert set(ref.activation_funcs) == set(ops.ACTIVATIONS), \
            "activation zoo drifted from the reference"
        for act in ref.activation_funcs:
            for gain, clamp in [(None, None), (2.0, 0.5)]:
                want = ref._bias_act_ref(
                    torch.from_numpy(x), torch.from_numpy(b), dim=1, act=act,
                    gain=gain, clamp=clamp).numpy()
                got = ops.bias_act(jnp.asarray(_nhwc(x)), jnp.asarray(b),
                                   act=act, gain=gain, clamp=clamp)
                np.testing.assert_allclose(
                    _nchw(got), want, rtol=1e-5, atol=1e-5,
                    err_msg=f"act={act} gain={gain} clamp={clamp}")

    @pytest.mark.parametrize("up,down,groups,flip_weight,kh", [
        (1, 1, 1, True, 3), (2, 1, 1, False, 3), (1, 2, 1, True, 3),
        (2, 1, 2, True, 3), (1, 1, 2, False, 1), (2, 2, 1, True, 3),
    ])
    def test_conv2d_resample(self, up, down, groups, flip_weight, kh):
        ref = _import_ref("torch_utils.ops.conv2d_resample")
        ref_fir = _import_ref("torch_utils.ops.upfirdn2d")
        rng = np.random.RandomState(3)
        ci, co = 4, 6
        x = rng.randn(2, ci, 8, 8).astype(np.float32)
        w = rng.randn(co, ci // groups, kh, kh).astype(np.float32)
        f = ref_fir.setup_filter([1, 3, 3, 1])
        want = ref.conv2d_resample(
            torch.from_numpy(x), torch.from_numpy(w), f=f, up=up, down=down,
            padding=kh // 2, groups=groups, flip_weight=flip_weight).numpy()
        # Mine is NHWC with HWIO weights (w[kh,kw,I//groups,O]).
        w_j = np.transpose(w, (2, 3, 1, 0))
        got = ops.conv2d_resample(
            jnp.asarray(_nhwc(x)), jnp.asarray(w_j),
            f=ops.setup_filter([1, 3, 3, 1]), up=up, down=down,
            padding=kh // 2, groups=groups, flip_weight=flip_weight)
        np.testing.assert_allclose(_nchw(got), want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("demodulate,fused,up", [
        (True, True, 1), (True, False, 1), (False, True, 1), (True, True, 2),
    ])
    def test_modulated_conv2d(self, demodulate, fused, up):
        nets = _import_ref("training.networks")
        ref_fir = _import_ref("torch_utils.ops.upfirdn2d")
        rng = np.random.RandomState(4)
        b, ci, co, k = 2, 4, 5, 3
        x = rng.randn(b, ci, 8, 8).astype(np.float32)
        w = rng.randn(co, ci, k, k).astype(np.float32)
        s = np.abs(rng.randn(b, ci)).astype(np.float32) + 0.5
        noise = rng.randn(b, 1, 8 * up, 8 * up).astype(np.float32)
        want = nets.modulated_conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(s),
            noise=torch.from_numpy(noise), up=up, padding=k // 2,
            resample_filter=ref_fir.setup_filter([1, 3, 3, 1]),
            demodulate=demodulate, flip_weight=(up == 1),
            fused_modconv=fused).numpy()
        got = ops.modulated_conv2d(
            jnp.asarray(_nhwc(x)), jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            jnp.asarray(s), noise=jnp.asarray(_nhwc(noise)), up=up,
            padding=k // 2, resample_filter=ops.setup_filter([1, 3, 3, 1]),
            demodulate=demodulate, flip_weight=(up == 1))
        np.testing.assert_allclose(_nchw(got), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Real reference Generator + sauto encoder -> snapshot pkl -> converter.
# ---------------------------------------------------------------------------

RES = 32          # blocks 4/8/16/32
ZDIM = 32
GEOM_CH = 6       # sauto post_filters[-1]
COLOR_W = 16

ENC_ARGS = dict(
    model_name="sauto", encoder_in_channels=1, decoder_out_channels=1,
    encoder_pre_filters=8, encoder_down_filters="16,16",
    encoder_post_filters="8,6", decoder_up_filters="12,10",
    preproc_type="-11inverse",
    widths="32,32",   # only consumed by the factory's summary_from_flags
)


def _Ns(d):
    """argparse.Namespace, exactly what reference encoder checkpoints store."""
    import argparse
    return argparse.Namespace(**d)


def _build_reference_models():
    """Construct the real networks_modified.Generator + sauto encoder."""
    nm = _import_ref("training.networks_modified")
    factory = _import_ref("forger.experimental.autoenc.factory")
    torch.manual_seed(0)
    G = nm.Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=RES, img_channels=3,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(
            channel_base=1024, channel_max=64, num_fp16_res=0, conv_clamp=256,
            architecture="orig", color_format="triad",
            color_w_channels=COLOR_W,
            geom_feature_channels=[GEOM_CH], geom_feature_resolutions=[8],
        )).eval()
    enc, _ = factory.create_autoencoder(_Ns(ENC_ARGS))
    enc = enc.eval()
    assert enc.feature_channels(0) == GEOM_CH
    return G, enc


def _write_reference_snapshot(path, G, enc):
    """Pickle exactly what the reference training loop snapshots: the
    persistence-wrapped G_ema plus args + embedded encoder checkpoint
    (training_loop_modified.py snapshot block / brush.py:588-590)."""
    snapshot = {
        "G_ema": G,   # @persistent_class: pickles via _reconstruct_persistent_obj
        "args": {"color_format": "triad", "geom_inject_resolutions": [0]},
        "encoder": {
            "model_state": {k: v for k, v in enc.state_dict().items()},
            "args": _Ns(ENC_ARGS),
        },
    }
    with open(path, "wb") as f:
        pickle.dump(snapshot, f)


@pytest.fixture(scope="module")
def ref_models(tmp_path_factory):
    G, enc = _build_reference_models()
    path = str(tmp_path_factory.mktemp("refsnap") / "network-snapshot.pkl")
    _write_reference_snapshot(path, G, enc)
    bundle = ckpt.convert_reference_snapshot(path)
    return G, enc, bundle


class TestReferenceGeneratorParity:
    def test_config_inferred_from_real_snapshot(self, ref_models):
        G, _enc, bundle = ref_models
        cfg = bundle.gen_cfg
        assert cfg.img_resolution == RES
        assert cfg.z_dim == ZDIM and cfg.w_dim == ZDIM
        assert cfg.num_ws == G.num_ws
        assert cfg.synthesis.geom_feature_resolutions == (8,)
        assert cfg.synthesis.geom_feature_channels == (GEOM_CH,)
        assert bundle.color_format == "triad"

    def test_premapped_forward_parity(self, ref_models):
        """forward_pre_mapped with distinct per-slot ws + const noise
        (networks_modified.py:346-365)."""
        G, _enc, bundle = ref_models
        rng = np.random.RandomState(10)
        ws = rng.randn(2, G.num_ws, ZDIM).astype(np.float32)
        geom8 = rng.randn(2, GEOM_CH, 8, 8).astype(np.float32)
        with torch.no_grad():
            want = G.forward_pre_mapped(
                torch.from_numpy(ws), [torch.from_numpy(geom8)],
                noise_mode="const").numpy()
        img, _, _ = generator_apply(
            bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
            ws=jnp.asarray(ws), geom_features=[jnp.asarray(_nhwc(geom8))],
            noise_mode="const")
        np.testing.assert_allclose(_nchw(img), want, rtol=1e-3, atol=3e-4)

    def test_z_path_parity(self, ref_models):
        """Full z -> mapping -> synthesis path (forward, :367-401)."""
        G, _enc, bundle = ref_models
        rng = np.random.RandomState(11)
        z = rng.randn(2, ZDIM).astype(np.float32)
        geom8 = rng.randn(2, GEOM_CH, 8, 8).astype(np.float32)
        with torch.no_grad():
            want = G(torch.from_numpy(z), None, [torch.from_numpy(geom8)],
                     noise_mode="const").numpy()
        img, _, _ = generator_apply(
            bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
            z=jnp.asarray(z), geom_features=[jnp.asarray(_nhwc(geom8))],
            noise_mode="const")
        np.testing.assert_allclose(_nchw(img), want, rtol=1e-3, atol=5e-4)

    def test_noise_buffer_override_parity(self, ref_models):
        """Per-style noise buffers as used by the brush library
        (forward_pre_mapped(noise_buffers=...))."""
        G, _enc, bundle = ref_models
        rng = np.random.RandomState(12)
        ws = rng.randn(1, G.num_ws, ZDIM).astype(np.float32)
        geom8 = rng.randn(1, GEOM_CH, 8, 8).astype(np.float32)
        bufs_np = {}
        for res in (8, 16, 32):
            bufs_np[f"b{res}.conv0.noise_const"] = \
                rng.randn(res, res).astype(np.float32)
            bufs_np[f"b{res}.conv1.noise_const"] = \
                rng.randn(res, res).astype(np.float32)
        with torch.no_grad():
            want = G.forward_pre_mapped(
                torch.from_numpy(ws), [torch.from_numpy(geom8)],
                noise_buffers={k: torch.from_numpy(v)
                               for k, v in bufs_np.items()},
                noise_mode="const").numpy()
        img, _, _ = generator_apply(
            bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
            ws=jnp.asarray(ws), geom_features=[jnp.asarray(_nhwc(geom8))],
            noise_buffers={k: jnp.asarray(v) for k, v in bufs_np.items()},
            noise_mode="const")
        np.testing.assert_allclose(_nchw(img), want, rtol=1e-3, atol=3e-4)

    def test_blended_features_parity(self, ref_models):
        """Stitching-time feature blending at the final resolution re-runs
        torgb (networks_modified.py:179-190)."""
        G, _enc, bundle = ref_models
        stitching = _import_ref_stitching()
        rng = np.random.RandomState(13)
        ws = rng.randn(2, G.num_ws, ZDIM).astype(np.float32)
        geom8 = rng.randn(2, GEOM_CH, 8, 8).astype(np.float32)
        res = RES
        nch = 1024 // res  # channels_dict at final res (min(channel_base/res, 64))
        feats = rng.randn(2, nch, res, res).astype(np.float32)
        alpha = rng.rand(2, 1, res, res).astype(np.float32)
        with torch.no_grad():
            bf = {res: stitching.BlendedFeatures(
                torch.from_numpy(feats), torch.from_numpy(alpha))}
            want = G.forward_pre_mapped(
                torch.from_numpy(ws), [torch.from_numpy(geom8)],
                blended_features=bf, noise_mode="const")
        if isinstance(want, tuple):
            want = want[0]
        want = want.numpy()
        img, _, _ = generator_apply(
            bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
            ws=jnp.asarray(ws), geom_features=[jnp.asarray(_nhwc(geom8))],
            blended_features={res: (jnp.asarray(_nhwc(feats)),
                                    jnp.asarray(_nhwc(alpha)))},
            noise_mode="const")
        np.testing.assert_allclose(_nchw(img), want, rtol=1e-3, atol=5e-4)


class TestReferenceEncoderParity:
    def test_encode_multires_parity(self, ref_models):
        """sauto encode() incl. white_on_black preprocessing
        (simple_autoencoder.py:289-297, base.py:123-134)."""
        _G, enc, bundle = ref_models
        rng = np.random.RandomState(20)
        geom = (rng.rand(2, 1, RES, RES) > 0.5).astype(np.float32)
        with torch.no_grad():
            want = enc.encode(torch.from_numpy(geom), res=[0, 1, 2])
        got = geo_encoder_encode(
            bundle.enc_cfg, bundle.enc_params, bundle.enc_state,
            jnp.asarray(_nhwc(geom)), res=[0, 1, 2])
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(_nchw(g), w.numpy(),
                                       rtol=1e-4, atol=1e-4)

    def test_full_stroke_pipeline_parity(self, ref_models):
        """geometry -> encoder -> generator, the serving-path composition."""
        G, enc, bundle = ref_models
        rng = np.random.RandomState(21)
        z = rng.randn(2, ZDIM).astype(np.float32)
        geom = (rng.rand(2, 1, RES, RES) > 0.5).astype(np.float32)
        with torch.no_grad():
            feats_t = enc.encode(torch.from_numpy(geom), res=[0])
            want = G(torch.from_numpy(z), None, feats_t,
                     noise_mode="const").numpy()
        feats = geo_encoder_encode(
            bundle.enc_cfg, bundle.enc_params, bundle.enc_state,
            jnp.asarray(_nhwc(geom)), res=[0])
        img, _, _ = generator_apply(
            bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
            z=jnp.asarray(z), geom_features=feats, noise_mode="const")
        np.testing.assert_allclose(_nchw(img), want, rtol=1e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# (d) ForgerLoss scalar parity on a fixed batch (loss_modified.py:140-245).
# ---------------------------------------------------------------------------

GEOM_LOSSES = "1.0*iou_inv(uvs)+1.0*iou(u)"   # train_flags.txt defaults
MAIN_LOSSES = "1.0*iou_inv(uvs)+0.7*dice(u)"


def _build_reference_discriminator():
    nets = _import_ref("training.networks")
    torch.manual_seed(7)
    return nets.Discriminator(
        c_dim=0, img_resolution=RES, img_channels=3, architecture="resnet",
        channel_base=1024, channel_max=64, num_fp16_res=0, conv_clamp=256,
        epilogue_kwargs=dict(mbstd_group_size=4)).eval()


@pytest.fixture(scope="module")
def loss_setup(ref_models):
    """Reference ForgerLoss + converted D on the same weights."""
    G, enc, bundle = ref_models
    from brushstroke_engine_tpu.utils.torch_extract import flatten_module_state
    D = _build_reference_discriminator()
    flat_d = {k: v.detach().numpy() for k, v in D.state_dict().items()}
    d_cfg = ckpt.infer_discriminator_config(flat_d, {"conv_clamp": 256.0})
    d_params = ckpt.convert_discriminator_state(flat_d, d_cfg)

    _import_ref_stitching()
    lm = _import_ref("training.loss_modified")
    fl = lm.ForgerLoss(
        device="cpu", G=G, D=D, geom_encoder=None, stitcher=None,
        augment_pipe=None, style_mixing_prob=0, r1_gamma=10,
        geom_phase_losses=GEOM_LOSSES, main_phase_losses=MAIN_LOSSES,
        geom_warmstart_losses=None, stitch_phase_losses="")

    rng = np.random.RandomState(30)
    batch = dict(
        z=rng.randn(4, ZDIM).astype(np.float32),
        geom8=rng.randn(4, GEOM_CH, 8, 8).astype(np.float32),
        real=np.tanh(rng.randn(4, 3, RES, RES)).astype(np.float32),
        geom=(rng.rand(4, 1, RES, RES) > 0.5).astype(np.float32),
    )
    return fl, D, d_cfg, d_params, batch


def _capture_stats(monkeypatch):
    lm = _import_ref("training.loss_modified")
    captured = {}

    def fake_report(name, value):
        captured[name] = np.asarray(
            value.detach().numpy() if hasattr(value, "detach") else value)
        return value

    monkeypatch.setattr(lm.training_stats, "report", fake_report)
    return captured


def _run_ref_phase(fl, batch, phase, monkeypatch):
    for net in (fl.G, fl.D):
        net.requires_grad_(True)
    captured = _capture_stats(monkeypatch)
    fl.accumulate_gradients(
        phase=phase,
        real_style=torch.from_numpy(batch["real"]),
        real_c=torch.zeros(4, 0), real_geom=torch.from_numpy(batch["geom"]),
        geom_feature=[torch.from_numpy(batch["geom8"])],
        gen_z=torch.from_numpy(batch["z"]), gen_c=torch.zeros(4, 0),
        sync=False, gain=1.0)
    return captured


class TestForgerLossParity:
    def _my_fake(self, bundle, batch, with_debug=True):
        img, dd, _ = generator_apply(
            bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
            z=jnp.asarray(batch["z"]),
            geom_features=[jnp.asarray(_nhwc(batch["geom8"]))],
            noise_mode="const", return_debug_data=with_debug)
        return img, dd

    def test_dmain_scalar_parity(self, ref_models, loss_setup, monkeypatch):
        from brushstroke_engine_tpu.models.discriminator import (
            discriminator_apply)
        _G, _enc, bundle = ref_models
        fl, _D, d_cfg, d_params, batch = loss_setup
        cap = _run_ref_phase(fl, batch, "Dmain", monkeypatch)

        img, _ = self._my_fake(bundle, batch, with_debug=True)
        fake_logits = discriminator_apply(d_cfg, d_params, img)
        real_logits = discriminator_apply(
            d_cfg, d_params, jnp.asarray(_nhwc(batch["real"])))
        loss = (jax.nn.softplus(fake_logits)
                + jax.nn.softplus(-real_logits))
        np.testing.assert_allclose(
            np.mean(np.asarray(fake_logits)), cap["Loss/scores/fake"].mean(),
            rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.mean(np.asarray(real_logits)), cap["Loss/scores/real"].mean(),
            rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.mean(np.asarray(loss)), cap["Loss/D/loss"].mean(),
            rtol=2e-3, atol=2e-3)

    def test_dr1_penalty_parity(self, ref_models, loss_setup, monkeypatch):
        from brushstroke_engine_tpu.models.discriminator import (
            discriminator_apply)
        _G, _enc, bundle = ref_models
        fl, _D, d_cfg, d_params, batch = loss_setup
        cap = _run_ref_phase(fl, batch, "Dreg", monkeypatch)

        def logit_sum(img):
            return jnp.sum(discriminator_apply(d_cfg, d_params, img,
                                               force_fp32=True))
        grads = jax.grad(logit_sum)(jnp.asarray(_nhwc(batch["real"])))
        penalty = jnp.sum(jnp.square(grads), axis=(1, 2, 3))
        np.testing.assert_allclose(
            np.asarray(penalty), cap["Loss/r1_penalty"].reshape(-1),
            rtol=5e-3, atol=5e-4)

    def test_gmain_total_parity(self, ref_models, loss_setup, monkeypatch):
        from brushstroke_engine_tpu.models.discriminator import (
            discriminator_apply)
        from brushstroke_engine_tpu.train.losses import ForgerLosses
        _G, _enc, bundle = ref_models
        fl, _D, d_cfg, d_params, batch = loss_setup
        cap = _run_ref_phase(fl, batch, "Gmain", monkeypatch)

        img, dd = self._my_fake(bundle, batch)
        gen_logits = discriminator_apply(d_cfg, d_params, img)
        gan = jnp.mean(jax.nn.softplus(-gen_logits))
        np.testing.assert_allclose(
            float(gan), cap["Loss/G/loss"].mean(), rtol=2e-3, atol=2e-3)

        forger_total, _vals = ForgerLosses.create_from_string(
            MAIN_LOSSES).compute(dd, jnp.asarray(_nhwc(batch["geom"])))
        np.testing.assert_allclose(
            float(forger_total), cap["Loss/forger/Gmain/total"].mean(),
            rtol=2e-3, atol=2e-4)

    def test_ggeom_phase_parity(self, ref_models, loss_setup, monkeypatch):
        from brushstroke_engine_tpu.train.losses import ForgerLosses
        _G, _enc, bundle = ref_models
        fl, _D, _d_cfg, _d_params, batch = loss_setup
        cap = _run_ref_phase(fl, batch, "Ggeom", monkeypatch)

        _img, dd = self._my_fake(bundle, batch)
        _total, vals = ForgerLosses.create_from_string(
            GEOM_LOSSES).compute(dd, jnp.asarray(_nhwc(batch["geom"])))
        ref_vals = {k.rsplit("/", 1)[-1]: v for k, v in cap.items()
                    if k.startswith("Loss/forger/Ggeom/")}
        assert set(vals) <= set(ref_vals), (sorted(vals), sorted(ref_vals))
        for name, mine in vals.items():
            np.testing.assert_allclose(
                float(mine), ref_vals[name].mean(), rtol=2e-3, atol=2e-4,
                err_msg=name)

    def test_gpl_penalty_parity(self, ref_models, loss_setup, monkeypatch):
        """Path-length reg with DETERMINISTIC pl_noise injected both sides."""
        from brushstroke_engine_tpu.models.mapping import mapping_apply
        _G, _enc, bundle = ref_models
        fl, _D, _d_cfg, _d_params, batch = loss_setup
        b = 4 // fl.pl_batch_shrink
        rng = np.random.RandomState(40)
        pl_noise = rng.randn(b, 3, RES, RES).astype(np.float32) / RES

        lm = _import_ref("training.loss_modified")
        monkeypatch.setattr(
            lm.torch, "randn_like",
            lambda t: torch.from_numpy(pl_noise * RES))
        cap = _run_ref_phase(fl, batch, "Greg", monkeypatch)

        cfg = bundle.gen_cfg
        ws, _ = mapping_apply(cfg.mapping, bundle.gen_params["mapping"],
                              jnp.asarray(batch["z"][:b]))

        def outp(ws_in):
            img, _, _ = generator_apply(
                cfg, bundle.gen_params, bundle.gen_state, ws=ws_in,
                geom_features=[jnp.asarray(_nhwc(batch["geom8"][:b]))],
                noise_mode="const")
            return jnp.sum(img * jnp.asarray(_nhwc(pl_noise)))

        pl_grads = jax.grad(outp)(ws)
        pl_lengths = jnp.sqrt(
            jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
        pl_mean = 0.0 + fl.pl_decay * (jnp.mean(pl_lengths) - 0.0)
        penalty = jnp.square(pl_lengths - pl_mean)
        np.testing.assert_allclose(
            np.asarray(penalty), cap["Loss/pl_penalty"].reshape(-1),
            rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# (e) Paint-engine tile parity: the reference TriadGanPaintEngine loaded from
# the SAME snapshot pkl vs our engine on the converted bundle
# (reference brush.py:244,683-805).
# ---------------------------------------------------------------------------

def _import_ref_brush():
    """forger.ui.brush needs torchvision/lpips/skimage; stub the missing ones
    (only debug/save paths touch them)."""
    import types
    _import_ref_stitching()
    if "skimage" not in sys.modules:
        from PIL import Image
        sk = types.ModuleType("skimage")
        skio = types.ModuleType("skimage.io")
        skio.imread = lambda p: np.asarray(Image.open(p))
        skio.imsave = lambda p, a: Image.fromarray(np.asarray(a)).save(p)
        sk.io = skio
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = skio
    return _import_ref("forger.ui.brush")


@pytest.fixture(scope="module")
def engine_snapshot(ref_models, tmp_path_factory):
    """Full training-snapshot layout (G/D/G_ema + EasyDict args + encoder),
    loadable by the reference's own legacy.load_network_pkl."""
    G, enc, _bundle = ref_models
    D = _build_reference_discriminator()
    dnnlib = _import_ref("dnnlib")
    snapshot = {
        "G": G, "D": D, "G_ema": G,
        "training_set_kwargs": None, "augment_pipe": None,
        "args": dnnlib.EasyDict(color_format="triad",
                                geom_inject_resolutions=[0]),
        "encoder": {
            "model_state": {k: v for k, v in enc.state_dict().items()},
            "args": _Ns(ENC_ARGS),
        },
    }
    path = str(tmp_path_factory.mktemp("fullsnap") / "network-snapshot.pkl")
    with open(path, "wb") as f:
        pickle.dump(snapshot, f)
    return path


@pytest.fixture(scope="module")
def engines(engine_snapshot):
    rb = _import_ref_brush()
    ref_eng = rb.PaintEngineFactory.create(engine_snapshot, device="cpu")
    from brushstroke_engine_tpu.engine.brush import PaintEngineFactory
    my_eng = PaintEngineFactory.create(engine_snapshot)
    assert ref_eng.patch_width == my_eng.patch_width == RES
    return rb, ref_eng, my_eng


def _stroke_patch():
    """Deterministic curve-ish RGBA stroke patch (opaque alpha = FG)."""
    patch = np.zeros((RES, RES, 4), np.uint8)
    yy = (np.sin(np.linspace(0, np.pi, RES)) * (RES - 8) + 4).astype(int)
    for x, y in enumerate(yy):
        patch[max(0, y - 2):y + 2, x, 3] = 255
    return patch


class TestPaintEngineParity:
    def _opts_pair(self, rb, seed=5):
        z = np.random.RandomState(seed).randn(1, ZDIM).astype(np.float32)
        opts_ref = rb.GanBrushOptions()
        opts_ref.set_style(torch.from_numpy(z))
        from brushstroke_engine_tpu.engine.brush import GanBrushOptions
        opts_my = GanBrushOptions()
        opts_my.set_style(z)
        return opts_ref, opts_my

    @staticmethod
    def _ref_render(ref_eng, patch, opts, **kw):
        """Reference engine-level render.  GanPaintEngine.render_stroke's own
        shape assert (brush.py:693) is broken for its [1,1,W,W] geom -- the
        production path (PaintingHelper, brush.py:302-312) calls
        _render_stroke_torch directly, so do the same + its uint8 postproc."""
        geom = ref_eng.prepare_geom_input(patch)
        with torch.no_grad():
            res, _raw, dbg = ref_eng._render_stroke_torch(geom, None, opts,
                                                          **kw)
        res = (res.detach().squeeze(0).permute(1, 2, 0) * 255).cpu()\
            .clip(0, 255).to(torch.uint8).numpy()
        return np.ascontiguousarray(res), dbg

    def test_render_stroke_clear_mode(self, engines):
        rb, ref_eng, my_eng = engines
        patch = _stroke_patch()
        opts_ref, opts_my = self._opts_pair(rb)
        want, _ = self._ref_render(ref_eng, patch, opts_ref)
        got, _ = my_eng.render_stroke(patch, None, opts_my)
        assert want.shape == got.shape == (RES, RES, 4)
        assert want.dtype == got.dtype == np.uint8
        # uint8 quantization of two fp32 pipelines: allow 1 level + stragglers
        diff = np.abs(want.astype(int) - got.astype(int))
        assert np.mean(diff <= 1) > 0.999, np.max(diff)

    def test_render_stroke_full_mode_user_colors(self, engines):
        rb, ref_eng, my_eng = engines
        patch = _stroke_patch()
        opts_ref, opts_my = self._opts_pair(rb, seed=6)
        color = np.asarray([250, 30, 60], np.uint8)
        opts_ref.set_color(0, torch.from_numpy(color))
        opts_my.set_color(0, color)
        ref_eng.set_render_mode("full")
        my_eng.set_render_mode("full")
        try:
            want, _ = self._ref_render(ref_eng, patch, opts_ref)
            got, _ = my_eng.render_stroke(patch, None, opts_my)
        finally:
            ref_eng.set_render_mode("clear")
            my_eng.set_render_mode("clear")
        diff = np.abs(want.astype(int) - got.astype(int))
        assert np.mean(diff <= 1) > 0.999, np.max(diff)

    def test_painting_helper_tile_parity(self, engines):
        """One stroke through the reference PaintingHelper (brush.py:244)
        vs ours on the same canvas area: full canvas-update semantics."""
        rb, ref_eng, my_eng = engines
        from brushstroke_engine_tpu.engine.canvas import PaintingHelper
        patch = _stroke_patch()
        opts_ref, opts_my = self._opts_pair(rb, seed=7)

        helper_ref = rb.PaintingHelper(ref_eng)
        helper_ref.make_new_canvas(128, 128, feature_blending=0)
        meta = {"x": 17, "y": 23}
        with torch.no_grad():
            want, _dbg, meta_ref = helper_ref.render_stroke(
                patch, np.zeros((RES, RES, 4), np.uint8), opts_ref,
                meta=dict(meta))

        helper_my = PaintingHelper(my_eng)
        helper_my.make_new_canvas(128, 128, feature_blending=0)
        got, _dbg2, meta_my = helper_my.render_stroke(
            patch, np.zeros((RES, RES, 4), np.uint8), opts_my,
            meta=dict(meta))
        assert meta_ref == meta_my
        assert want.shape == got.shape
        diff = np.abs(want.astype(int) - got.astype(int))
        assert np.mean(diff <= 1) > 0.995, np.max(diff)


# ---------------------------------------------------------------------------
# (f) Gradient/optimizer parity: parameter UPDATES match the reference.
#
# Two layers:
#   1. test_lazy_adam_semantics -- exact: identical injected grads through
#      torch.optim.Adam with the reference's lazy-regularization lr/beta
#      scaling (training_loop_modified.py:271-296) vs train/state.lazy_adam.
#   2. TestGradientUpdateParity -- end-to-end: one full phase cycle
#      (Gmain, Greg/PL, Dmain, Dreg/R1, Ggeom) on identical converted
#      weights + batch, reference ForgerLoss.accumulate_gradients
#      (loss_modified.py:140-272) + torch optimizer steps (the exact loop
#      code, training_loop_modified.py:430-496) vs train/steps.py + optax,
#      asserting per-tensor parameter deltas agree.  This is where silent
#      training divergence (R1/PL double-backward, gain placement, Adam
#      moment sharing across main/reg phases, geom-phase layer freezing)
#      would hide.
# ---------------------------------------------------------------------------

def _lazy_pair(lr, betas, eps, interval):
    """(torch kwargs, my optax optimizer) with reference lazy-reg scaling."""
    from brushstroke_engine_tpu.train.state import lazy_adam
    if interval is not None and interval > 1:
        mb = interval / (interval + 1)
        tk = dict(lr=lr * mb, betas=(betas[0] ** mb, betas[1] ** mb), eps=eps)
    else:
        tk = dict(lr=lr, betas=tuple(betas), eps=eps)
    return tk, lazy_adam(lr, betas[0], betas[1], eps, interval)


@pytest.mark.parametrize("interval", [None, 4, 16])
def test_lazy_adam_semantics(interval):
    """torch Adam (lazy-scaled) == optax lazy_adam on injected grads,
    including bias correction across steps and near-eps gradients."""
    rng = np.random.RandomState(50)
    p0 = rng.randn(64).astype(np.float32)
    # Mixed magnitudes: O(1), O(1e-4), near-eps, exact zero.
    scales = np.concatenate([np.ones(16), 1e-4 * np.ones(16),
                             1e-8 * np.ones(16), np.zeros(16)])
    grads = [(rng.randn(64) * scales).astype(np.float32) for _ in range(3)]

    tk, opt = _lazy_pair(2e-4, (0.0, 0.99), 1e-8, interval)
    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([pt], **tk)
    for g in grads:
        topt.zero_grad(set_to_none=True)
        pt.grad = torch.from_numpy(g.copy())
        topt.step()

    pj = jnp.asarray(p0)
    ostate = opt.init(pj)
    for g in grads:
        upd, ostate = opt.update(jnp.asarray(g), ostate, pj)
        pj = optax.apply_updates(pj, upd)

    np.testing.assert_allclose(np.asarray(pj), pt.detach().numpy(),
                               rtol=0, atol=1e-7)


def _flat_tree(tree):
    from jax.tree_util import tree_flatten_with_path, keystr
    leaves, _ = tree_flatten_with_path(tree)
    return {keystr(p): np.array(v, dtype=np.float64) for p, v in leaves}


def _np_snapshot(tree):
    """Deep numpy copy (the phase steps donate their input state)."""
    return jax.tree_util.tree_map(lambda x: np.array(x), tree)


def _assert_update_parity(before, mine_after, ref_after, lr_eff, label):
    """Per-tensor: |delta_mine - delta_ref| small vs the Adam step size.

    With beta1=0 at t=1, |delta| ~= lr * |g|/(|g|+eps): a near-sign
    function of the gradient, so 10% of lr is a tight elementwise bound
    away from the |g|~eps boundary; the mean bound catches systematic
    error.  Reference-frozen tensors (delta_ref == 0, e.g. geom-phase
    layer freezing) must be EXACTLY untouched on our side too."""
    fb, fm, fr = map(_flat_tree, (before, mine_after, ref_after))
    assert set(fb) == set(fm) == set(fr)
    for k in sorted(fb):
        dm = fm[k] - fb[k]
        dr = fr[k] - fb[k]
        if not np.any(dr):
            assert not np.any(np.abs(dm) > 1e-12), \
                f"{label}:{k} updated a tensor the reference froze"
            continue
        diff = np.abs(dm - dr)
        assert diff.mean() < 0.02 * lr_eff, \
            (label, k, float(diff.mean() / lr_eff))
        assert np.mean(diff < 0.1 * lr_eff) > 0.99, \
            (label, k, float(np.mean(diff < 0.1 * lr_eff)))


def _force_const_noise(monkeypatch):
    """The reference's run_G never passes noise_mode, so SynthesisLayer
    draws fresh random noise (networks.py:362-371); force 'const' so both
    frameworks consume the SAME converted noise buffers (gradients w.r.t.
    noise_strength depend on the actual noise values).

    The reference tree is imported under TWO module names ('training.*' via
    the SG2 path injection, and 'thirdparty.stylegan2_ada_pytorch.training.*'
    via networks_modified.py:21), giving two distinct SynthesisLayer class
    objects; the Generator's blocks are built from the thirdparty-anchored
    one, so BOTH must be patched (round-5 fix: patching only
    'training.networks' left the reference drawing random noise, which the
    loss hides -- noise_strength is 0 -- but its gradient does not)."""
    import importlib
    mods = [_import_ref("training.networks"),
            importlib.import_module(
                "thirdparty.stylegan2_ada_pytorch.training.networks")]

    for nets in mods:
        orig = nets.SynthesisLayer.forward

        def forced(self, x, w, noise_mode="random", *, _orig=orig, **kw):
            return _orig(self, x, w, noise_mode="const", **kw)

        monkeypatch.setattr(nets.SynthesisLayer, "forward", forced)


def _ref_phase_opt_step(fl, module, opt, batch, phase, gain, prep=None):
    """Exactly the reference training loop's per-phase execution
    (training_loop_modified.py:430-496): zero_grad, requires_grad_(True),
    prep_module, accumulate_gradients, requires_grad_(False),
    nan_to_num grad scrub, opt.step()."""
    opt.zero_grad(set_to_none=True)
    module.requires_grad_(True)
    if prep is not None:
        prep(module)
    fl.accumulate_gradients(
        phase=phase,
        real_style=torch.from_numpy(batch["real"]),
        real_c=torch.zeros(4, 0), real_geom=torch.from_numpy(batch["geom"]),
        geom_feature=[torch.from_numpy(batch["geom8"])],
        gen_z=torch.from_numpy(batch["z"]), gen_c=torch.zeros(4, 0),
        sync=False, gain=gain)
    module.requires_grad_(False)
    for p in module.parameters():
        if p.grad is not None:
            torch.nan_to_num(p.grad, nan=0.0, posinf=1e5, neginf=-1e5,
                             out=p.grad)
    opt.step()


@pytest.fixture()
def grad_setup(ref_models, loss_setup):
    """Deep-copied reference modules + fresh ForgerLoss + the exact
    reference optimizers, so optimizer steps don't mutate the module-scope
    fixtures shared with the scalar-parity tests."""
    import copy
    G0, _enc, bundle = ref_models
    _fl0, D0, d_cfg, d_params, batch = loss_setup
    G = copy.deepcopy(G0)
    D = copy.deepcopy(D0)
    _import_ref_stitching()
    lm = _import_ref("training.loss_modified")
    fl = lm.ForgerLoss(
        device="cpu", G=G, D=D, geom_encoder=None, stitcher=None,
        augment_pipe=None, style_mixing_prob=0, r1_gamma=10,
        geom_phase_losses=GEOM_LOSSES, main_phase_losses=MAIN_LOSSES,
        geom_warmstart_losses=None, stitch_phase_losses="")
    # training_loop_modified.py:271-296: shared G/D optimizers with
    # lazy-reg scaling; separate geom Adam(0, 0.99) over G.
    tk_g, _ = _lazy_pair(2e-4, (0.0, 0.99), 1e-8, 4)
    tk_d, _ = _lazy_pair(2e-4, (0.0, 0.99), 1e-8, 16)
    g_opt = torch.optim.Adam(G.parameters(), **tk_g)
    d_opt = torch.optim.Adam(D.parameters(), **tk_d)
    geom_opt = torch.optim.Adam(G.parameters(), lr=2e-4, betas=(0.0, 0.99),
                                eps=1e-8)
    return dict(G=G, D=D, fl=fl, g_opt=g_opt, d_opt=d_opt,
                geom_opt=geom_opt, bundle=bundle, d_cfg=d_cfg,
                d_params=d_params, batch=batch)


def _convert_g(G, gen_cfg):
    flat = {k: v.detach().numpy() for k, v in G.state_dict().items()}
    params, _state = ckpt.convert_generator_state(flat, gen_cfg)
    return params


def _convert_d(D, d_cfg):
    flat = {k: v.detach().numpy() for k, v in D.state_dict().items()}
    return ckpt.convert_discriminator_state(flat, d_cfg)


class TestGradientUpdateParity:
    """One full phase cycle: every parameter update matches the reference."""

    def test_full_phase_cycle_updates(self, grad_setup, monkeypatch):
        from brushstroke_engine_tpu.train.state import (
            TrainConfig, init_train_state, make_optimizers)
        from brushstroke_engine_tpu.train import steps

        gs = grad_setup
        bundle, batch, d_cfg = gs["bundle"], gs["batch"], gs["d_cfg"]
        _force_const_noise(monkeypatch)

        cfg = TrainConfig(
            gen_cfg=bundle.gen_cfg, disc_cfg=d_cfg, enc_cfg=bundle.enc_cfg,
            batch_size=4, noise_mode="const", style_mixing_prob=0.0,
            r1_gamma=10.0, main_phase_losses=MAIN_LOSSES,
            geom_phase_losses=GEOM_LOSSES, geom_warmstart_losses=GEOM_LOSSES,
            augment=None, geom_phase_mode="last_and_rgb")
        assert cfg.g_reg_interval == 4 and cfg.d_reg_interval == 16

        state = init_train_state(cfg, jax.random.PRNGKey(0),
                                 g_params=bundle.gen_params,
                                 g_state=bundle.gen_state)
        _, d_optax, _ = make_optimizers(cfg)
        dp = jax.tree_util.tree_map(jnp.array, gs["d_params"])
        state["d_params"] = dp
        state["d_opt"] = d_optax.init(dp)

        feats = [jnp.asarray(_nhwc(batch["geom8"]))]
        truth = jnp.asarray(_nhwc(batch["geom"]))
        real = jnp.asarray(_nhwc(batch["real"]))
        z = jnp.asarray(batch["z"])
        ema_beta = jnp.float32(0.5)

        lr_g = 2e-4 * (4 / 5)
        lr_d = 2e-4 * (16 / 17)

        # --- Gmain (gain = interval = 1) -------------------------------
        g_before = _np_snapshot(state["g_params"])
        state, _ = steps.g_main_step(cfg, state, feats, truth, z,
                                     jax.random.PRNGKey(1), ema_beta)
        _ref_phase_opt_step(gs["fl"], gs["G"], gs["g_opt"], batch,
                            "Gmain", gain=1.0)
        _assert_update_parity(g_before, state["g_params"],
                              _convert_g(gs["G"], cfg.gen_cfg),
                              lr_g, "Gmain")

        # --- Greg / path length (gain = 4, SAME g_opt: shared Adam
        # moments + bias-correction t advance) ---------------------------
        rng_pl = jax.random.PRNGKey(123)
        _k_g, k_noise = jax.random.split(rng_pl)
        b = 4 // cfg.pl_batch_shrink
        pl_noise_nhwc = np.asarray(
            jax.random.normal(k_noise, (b, RES, RES, 3), jnp.float32)
        ) / np.sqrt(RES * RES)
        raw = np.ascontiguousarray(
            np.transpose(pl_noise_nhwc, (0, 3, 1, 2))
        ) * np.sqrt(RES * RES)
        lm = _import_ref("training.loss_modified")
        monkeypatch.setattr(
            lm.torch, "randn_like",
            lambda t: torch.from_numpy(raw.astype(np.float32)))

        g_before = _np_snapshot(state["g_params"])
        state, _ = steps.g_reg_step(cfg, state, feats, z, rng_pl, ema_beta)
        _ref_phase_opt_step(gs["fl"], gs["G"], gs["g_opt"], batch,
                            "Greg", gain=4.0)
        monkeypatch.setattr(lm.torch, "randn_like", torch.randn_like)
        _assert_update_parity(g_before, state["g_params"],
                              _convert_g(gs["G"], cfg.gen_cfg),
                              lr_g, "Greg")
        # pl_mean buffer evolves identically (loss_modified.py:218-220).
        np.testing.assert_allclose(
            float(state["pl_mean"]), float(gs["fl"].pl_mean), rtol=1e-4)

        # --- Dmain (gain = 1) -------------------------------------------
        d_before = _np_snapshot(state["d_params"])
        state, _ = steps.d_main_step(cfg, state, real, feats, z,
                                     jax.random.PRNGKey(2))
        _ref_phase_opt_step(gs["fl"], gs["D"], gs["d_opt"], batch,
                            "Dmain", gain=1.0)
        _assert_update_parity(d_before, state["d_params"],
                              _convert_d(gs["D"], d_cfg), lr_d, "Dmain")

        # --- Dreg / R1 (gain = 16, SAME d_opt) ---------------------------
        d_before = _np_snapshot(state["d_params"])
        state, _ = steps.d_reg_step(cfg, state, real, jax.random.PRNGKey(3))
        _ref_phase_opt_step(gs["fl"], gs["D"], gs["d_opt"], batch,
                            "Dreg", gain=16.0)
        _assert_update_parity(d_before, state["d_params"],
                              _convert_d(gs["D"], d_cfg), lr_d, "Dreg")

        # --- Ggeom (no gain, separate geom Adam, last_and_rgb freeze) ----
        geom_step = steps.make_geom_step(cfg, warmstart=False)
        g_before = _np_snapshot(state["g_params"])
        state, _ = geom_step(state, feats, truth, z, jax.random.PRNGKey(4),
                             ema_beta)
        _ref_phase_opt_step(
            gs["fl"], gs["G"], gs["geom_opt"], batch, "Ggeom", gain=200.0,
            prep=lambda m: m.set_trainable_layers("last_and_rgb"))
        _assert_update_parity(g_before, state["g_params"],
                              _convert_g(gs["G"], cfg.gen_cfg),
                              2e-4, "Ggeom")

        # --- Cumulative: both parameter sets still agree after the full
        # cycle (3 G steps + 2 D steps of compounding state). -------------
        fg_m = _flat_tree(state["g_params"])
        fg_r = _flat_tree(_convert_g(gs["G"], cfg.gen_cfg))
        worst = max(np.abs(fg_m[k] - fg_r[k]).mean() for k in fg_m)
        assert worst < 0.05 * lr_g * 3, worst


# ---------------------------------------------------------------------------
# (g) Gstitch + finetune (frozen-G_orig) update parity — round-5 VERDICT
# task 3.  Both phases were load-bearing in the r4 training runs but only
# self-consistency tested before.
# ---------------------------------------------------------------------------

STITCH_LOSSES = "1.0*gan(fake)+1.0*gan(fake_composite)+1.0*l1(patch)"
# finetune_flags.txt minus the lpips term: the reference's LPIPSLossItem
# needs the `lpips` package (absent here, stubbed to raise), so executable
# parity for it is env-blocked; l1(fake_orig) exercises the same frozen-
# G_orig plumbing (loss_modified.py:181-204) with an executable target.
WARM_ORIG_LOSSES = "0.5*iou_inv(uvs)+0.5*l1(fake_orig)"


class TestStitchAndFinetuneParity:
    def test_gstitch_updates(self, grad_setup, monkeypatch):
        """accumulate_gradients_stitch (loss_modified.py:108-138) vs
        train/steps.make_stitch_step: G deltas through the SHARED lazy G
        Adam match.  crop_margin=0 nulls the reference's offset-crop
        indexing quirk (stitching.py:246-252, documented divergence in
        train/stitching.py) so the composites/patches align exactly."""
        from brushstroke_engine_tpu.train.state import (
            TrainConfig, init_train_state, make_optimizers)
        from brushstroke_engine_tpu.train import steps
        from brushstroke_engine_tpu.train.stitching import (
            RandomStitcher as MyStitcher)

        gs = grad_setup
        bundle, batch, d_cfg = gs["bundle"], gs["batch"], gs["d_cfg"]
        _force_const_noise(monkeypatch)
        stitching_mod = _import_ref_stitching()
        lm = _import_ref("training.loss_modified")

        rng = np.random.RandomState(60)
        pos = rng.randint(0, RES - 1, size=(4, 2)).astype(np.int64)
        geom8_2 = rng.randn(4, GEOM_CH, 8, 8).astype(np.float32)
        crop1 = (0, 0, RES, RES)
        crop2 = (6, 6, RES, RES)   # overlap 26x26 == min_overlap below

        monkeypatch.setattr(
            stitching_mod.RandomStitcher, "gen_random_positions",
            staticmethod(lambda batch_, width: torch.from_numpy(pos.copy())))
        ref_stitcher = stitching_mod.RandomStitcher(
            crop_margin=0, min_overlap=RES - 6)
        fl = lm.ForgerLoss(
            device="cpu", G=gs["G"], D=gs["D"], geom_encoder=None,
            stitcher=ref_stitcher, augment_pipe=None, style_mixing_prob=0,
            r1_gamma=10, geom_phase_losses=GEOM_LOSSES,
            main_phase_losses=MAIN_LOSSES, geom_warmstart_losses=None,
            stitch_phase_losses=STITCH_LOSSES)

        cfg = TrainConfig(
            gen_cfg=bundle.gen_cfg, disc_cfg=d_cfg, enc_cfg=bundle.enc_cfg,
            batch_size=4, noise_mode="const", style_mixing_prob=0.0,
            r1_gamma=10.0, main_phase_losses=MAIN_LOSSES,
            geom_phase_losses=GEOM_LOSSES, geom_warmstart_losses=GEOM_LOSSES,
            stitch_phase_losses=STITCH_LOSSES, stitch_interval=4,
            augment=None, geom_phase_mode="last_and_rgb")
        state = init_train_state(cfg, jax.random.PRNGKey(0),
                                 g_params=bundle.gen_params,
                                 g_state=bundle.gen_state)
        _, d_optax, _ = make_optimizers(cfg)
        dp = jax.tree_util.tree_map(jnp.array, gs["d_params"])
        state["d_params"] = dp
        state["d_opt"] = d_optax.init(dp)

        stitch_step = steps.make_stitch_step(
            cfg, stitcher=MyStitcher(crop_margin=0, min_overlap=RES - 6))
        g_before = _np_snapshot(state["g_params"])
        state, stats = stitch_step(
            state, [jnp.asarray(_nhwc(batch["geom8"]))],
            [jnp.asarray(_nhwc(geom8_2))], jnp.asarray(batch["z"]),
            jnp.asarray(crop1), jnp.asarray(crop2), jax.random.PRNGKey(1),
            jnp.float32(0.5), positions1=jnp.asarray(pos))

        # The exact reference loop execution for the Gstitch phase
        # (training_loop_modified.py:417-462, gain hardcoded 1, shared
        # G optimizer).
        gs["g_opt"].zero_grad(set_to_none=True)
        gs["G"].requires_grad_(True)
        fl.accumulate_gradients_stitch(
            geom_feature1=[torch.from_numpy(batch["geom8"])],
            geom_feature2=[torch.from_numpy(geom8_2)],
            crop1=crop1, crop2=crop2,
            gen_z=torch.from_numpy(batch["z"]), gen_c=torch.zeros(4, 0),
            gain=1)
        gs["G"].requires_grad_(False)
        for p in gs["G"].parameters():
            if p.grad is not None:
                torch.nan_to_num(p.grad, nan=0.0, posinf=1e5, neginf=-1e5,
                                 out=p.grad)
        gs["g_opt"].step()

        _assert_update_parity(g_before, state["g_params"],
                              _convert_g(gs["G"], cfg.gen_cfg),
                              2e-4 * (4 / 5), "Gstitch")

    def test_ggeom_warm_fake_orig_updates(self, grad_setup, monkeypatch):
        """Ggeom-warm with frozen-G_orig anchoring (the clarity-finetune
        phase, loss_modified.py:181-204): fake_orig comes from the frozen
        pre-finetune generator, style mixing is forced off, the l1 target
        is detached, and last_and_rgb freezing still holds."""
        import copy
        from brushstroke_engine_tpu.train.state import (
            TrainConfig, init_train_state)
        from brushstroke_engine_tpu.train import steps

        gs = grad_setup
        bundle, batch, d_cfg = gs["bundle"], gs["batch"], gs["d_cfg"]
        _force_const_noise(monkeypatch)
        lm = _import_ref("training.loss_modified")

        # G_orig = the pre-finetune weights; then deterministically perturb
        # the live G so fake_img != fake_orig (nonzero l1 gradient).
        G_orig = copy.deepcopy(gs["G"])
        with torch.no_grad():
            for p in gs["G"].parameters():
                p.add_(2e-3 * torch.sin(
                    torch.arange(p.numel(), dtype=torch.float32)
                ).reshape(p.shape))

        fl = lm.ForgerLoss(
            device="cpu", G=gs["G"], D=gs["D"], geom_encoder=None,
            stitcher=None, augment_pipe=None, style_mixing_prob=0,
            r1_gamma=10, geom_phase_losses=GEOM_LOSSES,
            main_phase_losses=MAIN_LOSSES,
            geom_warmstart_losses=WARM_ORIG_LOSSES, stitch_phase_losses="")
        assert fl.requires_frozen_generator()

        cfg = TrainConfig(
            gen_cfg=bundle.gen_cfg, disc_cfg=d_cfg, enc_cfg=bundle.enc_cfg,
            batch_size=4, noise_mode="const", style_mixing_prob=0.0,
            r1_gamma=10.0, main_phase_losses=MAIN_LOSSES,
            geom_phase_losses=GEOM_LOSSES,
            geom_warmstart_losses=WARM_ORIG_LOSSES,
            augment=None, geom_phase_mode="last_and_rgb",
            geom_warmstart_mode="last_and_rgb")
        g_perturbed = jax.tree_util.tree_map(
            jnp.asarray, _convert_g(gs["G"], cfg.gen_cfg))
        state = init_train_state(cfg, jax.random.PRNGKey(0),
                                 g_params=g_perturbed,
                                 g_state=bundle.gen_state)
        g_orig_params = jax.tree_util.tree_map(
            jnp.asarray, _convert_g(G_orig, cfg.gen_cfg))

        warm_step = steps.make_geom_step(cfg, warmstart=True)
        g_before = _np_snapshot(state["g_params"])
        state, stats = warm_step(
            state, [jnp.asarray(_nhwc(batch["geom8"]))],
            jnp.asarray(_nhwc(batch["geom"])), jnp.asarray(batch["z"]),
            jax.random.PRNGKey(1), jnp.float32(0.5),
            g_orig_params=g_orig_params)
        assert "Loss/forger/Ggeom-warm/l1_fake_orig" in stats
        assert float(stats["Loss/forger/Ggeom-warm/l1_fake_orig"]) > 0

        # Reference: the Ggeom-warm phase step with G_orig wired exactly as
        # training_loop_modified.py:479 passes it.
        gs["geom_opt"].zero_grad(set_to_none=True)
        gs["G"].requires_grad_(True)
        gs["G"].set_trainable_layers("last_and_rgb")
        fl.accumulate_gradients(
            phase="Ggeom-warm",
            real_style=torch.from_numpy(batch["real"]),
            real_c=torch.zeros(4, 0),
            real_geom=torch.from_numpy(batch["geom"]),
            geom_feature=[torch.from_numpy(batch["geom8"])],
            gen_z=torch.from_numpy(batch["z"]), gen_c=torch.zeros(4, 0),
            sync=False, gain=200.0, G_orig=G_orig)
        gs["G"].requires_grad_(False)
        for p in gs["G"].parameters():
            if p.grad is not None:
                torch.nan_to_num(p.grad, nan=0.0, posinf=1e5, neginf=-1e5,
                                 out=p.grad)
        gs["geom_opt"].step()

        _assert_update_parity(g_before, state["g_params"],
                              _convert_g(gs["G"], cfg.gen_cfg),
                              2e-4, "Ggeom-warm/fake_orig")
        # The frozen G_orig itself must be untouched on both sides.
        fo = _flat_tree(g_orig_params)
        fo2 = _flat_tree(jax.tree_util.tree_map(
            jnp.asarray, _convert_g(G_orig, cfg.gen_cfg)))
        for k in fo:
            np.testing.assert_array_equal(fo[k], fo2[k])
