"""End-to-end converted-checkpoint activation parity (VERDICT round-1 #3).

Builds a small reference-layout snapshot pkl OFFLINE: a torch generator +
sauto geometry encoder implementing the documented reference math
(networks_modified.py:228-401, networks.py:31-88/303-536,
autoenc/simple_autoencoder.py semantics) -- written here from the math, NOT
imported from the reference.  The torch generator uses the reference's
FUSED grouped-conv modulated-conv path, so this also independently
validates the equivalence of our activation-scaling form.

The snapshot is pickled in the reference persistence structure
({G_ema, args, encoder} with nested _parameters/_buffers/_modules dicts and
a ``torch_utils.persistence._reconstruct_persistent_obj`` global), then:

  pkl -> utils.checkpoint.convert_reference_snapshot -> generator_apply /
  geo_encoder_encode, asserted against the torch goldens to fp32 tolerance.
"""

import math
import pickle
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from brushstroke_engine_tpu.models.generator import generator_apply
from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode
from brushstroke_engine_tpu.utils import checkpoint as ckpt

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

SQRT2 = math.sqrt(2.0)
CLAMP = 256.0


# ---------------------------------------------------------------------------
# Torch reference math: upfirdn / conv2d_resample / modulated conv (fused).
# ---------------------------------------------------------------------------

def _setup_filter_t(taps=(1, 3, 3, 1)):
    f = torch.tensor(taps, dtype=torch.float32)
    f = f / f.sum()
    return torch.outer(f, f)


def _zero_stuff(x, up):
    """Insert up-1 zeros between pixels: [B,C,H,W] -> [B,C,(H-1)up+1,...]."""
    if up == 1:
        return x
    b, c, h, w = x.shape
    y = torch.zeros(b, c, h, up, w, up, dtype=x.dtype)
    y[:, :, :, 0, :, 0] = x
    return y.reshape(b, c, h * up, w * up)[:, :, :(h - 1) * up + 1,
                                           :(w - 1) * up + 1]


def _upfirdn2d_t(x, f, padding=(0, 0, 0, 0), gain=1.0, down=1):
    """Reference upfirdn2d executable spec (convolution convention)."""
    px0, px1, py0, py1 = padding
    c = x.shape[1]
    f = torch.flip(f, [0, 1]) * gain
    x = F.pad(x, (px0, px1, py0, py1))
    w = f[None, None].expand(c, 1, *f.shape)
    return F.conv2d(x, w, groups=c, stride=down)


def _conv2d_resample_t(x, w, f=None, up=1, padding=0, groups=1,
                       flip_weight=True):
    """Reference conv2d_resample math (padding w.r.t. upsampled image)."""
    px0 = px1 = py0 = py1 = padding
    if f is not None:
        fh, fw = f.shape
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if not flip_weight:
        w = torch.flip(w, [2, 3])
    if up > 1:
        x = _zero_stuff(x, up)
        x = F.pad(x, (px0, px1 + up - 1, py0, py1 + up - 1))
        x = F.conv2d(x, w, groups=groups)
        return _upfirdn2d_t(x, f, gain=up ** 2)
    x = F.pad(x, (px0, px1, py0, py1))
    return F.conv2d(x, w, groups=groups)


def _modulated_conv2d_t(x, weight, styles, up=1, padding=0, f=None,
                        demodulate=True, flip_weight=True):
    """Reference FUSED path: per-sample weights + grouped conv
    (networks.py:31-88)."""
    b = x.shape[0]
    o, i, kh, kw = weight.shape
    w = weight[None] * styles[:, None, :, None, None]        # [B,O,I,k,k]
    if demodulate:
        d = (w.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()   # [B,O]
        w = w * d[..., None, None, None]
    x = x.reshape(1, b * i, *x.shape[2:])
    w = w.reshape(b * o, i, kh, kw)
    x = _conv2d_resample_t(x, w, f=f, up=up, padding=padding, groups=b,
                           flip_weight=flip_weight)
    return x.reshape(b, o, *x.shape[2:])


def _fc_t(weight, bias, x, act="linear", lr=1.0):
    """Reference equalized FullyConnectedLayer."""
    w = weight * (lr / math.sqrt(weight.shape[1]))
    y = x @ w.t() + bias * lr
    if act == "lrelu":
        y = F.leaky_relu(y, 0.2) * SQRT2
    return y


# ---------------------------------------------------------------------------
# Torch golden generator (reference layout/naming).
# ---------------------------------------------------------------------------

class _SynLayer(nn.Module):
    def __init__(self, in_ch, out_ch, w_dim, res, g):
        super().__init__()
        self.affine = nn.Module()
        self.affine.weight = nn.Parameter(torch.randn(in_ch, w_dim,
                                                      generator=g))
        self.affine.bias = nn.Parameter(
            1.0 + 0.1 * torch.randn(in_ch, generator=g))
        self.weight = nn.Parameter(torch.randn(out_ch, in_ch, 3, 3,
                                               generator=g))
        self.bias = nn.Parameter(0.1 * torch.randn(out_ch, generator=g))
        self.noise_strength = nn.Parameter(
            0.3 * torch.randn((), generator=g))
        self.register_buffer("noise_const", torch.randn(res, res,
                                                        generator=g))

    def forward(self, x, w_vec, up, f):
        styles = _fc_t(self.affine.weight, self.affine.bias, w_vec)
        x = _modulated_conv2d_t(x, self.weight, styles, up=up, padding=1,
                                f=f, demodulate=True, flip_weight=(up == 1))
        x = x + self.noise_const[None, None] * self.noise_strength
        x = x + self.bias[None, :, None, None]
        x = F.leaky_relu(x, 0.2) * SQRT2
        return x.clamp(-CLAMP, CLAMP)


class _ToRGBTriad(nn.Module):
    def __init__(self, in_ch, w_dim, g):
        super().__init__()
        self.in_ch = in_ch
        self.affine = nn.Module()
        self.affine.weight = nn.Parameter(torch.randn(in_ch + 9, w_dim,
                                                      generator=g))
        self.affine.bias = nn.Parameter(
            1.0 + 0.1 * torch.randn(in_ch + 9, generator=g))
        self.weight = nn.Parameter(torch.randn(3, in_ch, 1, 1, generator=g))
        self.bias = nn.Parameter(0.1 * torch.randn(3, generator=g))
        self.color_bias = nn.Parameter(0.1 * torch.randn(9, generator=g))

    def forward(self, x, w_vec):
        scaled = _fc_t(self.affine.weight, self.affine.bias, w_vec)
        colors = torch.tanh(scaled[:, :9] + self.color_bias)
        colors = colors.reshape(-1, 3, 3)                    # [B, rgb, k]
        styles = scaled[:, 9:] / math.sqrt(self.in_ch)
        x = _modulated_conv2d_t(x, self.weight, styles, demodulate=False)
        x = (x + self.bias[None, :, None, None]).clamp(-CLAMP, CLAMP)
        uvs = torch.softmax(x, dim=1)                        # [B, k, H, W]
        return torch.einsum("bkhw,bck->bchw", uvs, colors)


class TorchGolden(nn.Module):
    """z_dim=w_dim=8, 2 mapping layers, 16px trunk (b4, b8, b16), triad
    torgb, 6-channel geometry injection after the 8px block."""

    Z_DIM = 8
    W_DIM = 8
    GEOM_CH = 6
    NUM_WS = 6

    def __init__(self, seed=0):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        self.mapping = nn.Module()
        self.mapping.fc0 = nn.Module()
        self.mapping.fc0.weight = nn.Parameter(
            torch.randn(8, 8, generator=g) / 0.01)
        self.mapping.fc0.bias = nn.Parameter(
            0.1 * torch.randn(8, generator=g))
        self.mapping.fc1 = nn.Module()
        self.mapping.fc1.weight = nn.Parameter(
            torch.randn(8, 8, generator=g) / 0.01)
        self.mapping.fc1.bias = nn.Parameter(
            0.1 * torch.randn(8, generator=g))
        self.mapping.register_buffer("w_avg", torch.zeros(8))

        self.synthesis = nn.Module()
        b4 = nn.Module()
        b4.const = nn.Parameter(torch.randn(16, 4, 4, generator=g))
        b4.conv1 = _SynLayer(16, 16, 8, 4, g)
        b8 = nn.Module()
        b8.conv0 = _SynLayer(16, 8, 8, 8, g)
        b8.conv1 = _SynLayer(8, 8, 8, 8, g)
        b16 = nn.Module()
        b16.conv0 = _SynLayer(8 + self.GEOM_CH, 4, 8, 16, g)
        b16.conv1 = _SynLayer(4, 4, 8, 16, g)
        b16.torgb = _ToRGBTriad(4, 8, g)
        self.synthesis.b4 = b4
        self.synthesis.b8 = b8
        self.synthesis.b16 = b16
        self.f = _setup_filter_t()

    def map_z(self, z):
        x = z * (z.square().mean(dim=1, keepdim=True) + 1e-8).rsqrt()
        x = _fc_t(self.mapping.fc0.weight, self.mapping.fc0.bias, x,
                  act="lrelu", lr=0.01)
        x = _fc_t(self.mapping.fc1.weight, self.mapping.fc1.bias, x,
                  act="lrelu", lr=0.01)
        return x[:, None, :].expand(-1, self.NUM_WS, -1)

    def forward(self, ws, geom8):
        """ws [B, 6, 8]; geom8 [B, GEOM_CH, 8, 8] injected after b8."""
        b = ws.shape[0]
        x = self.synthesis.b4.const[None].expand(b, -1, -1, -1)
        x = self.synthesis.b4.conv1(x, ws[:, 0], up=1, f=self.f)
        x = self.synthesis.b8.conv0(x, ws[:, 1], up=2, f=self.f)
        x = self.synthesis.b8.conv1(x, ws[:, 2], up=1, f=self.f)
        x = torch.cat([x, geom8], dim=1)
        x = self.synthesis.b16.conv0(x, ws[:, 3], up=2, f=self.f)
        x = self.synthesis.b16.conv1(x, ws[:, 4], up=1, f=self.f)
        return self.synthesis.b16.torgb(x, ws[:, 5])


# ---------------------------------------------------------------------------
# Torch golden sauto encoder (legacy order: conv -> BN -> lrelu(0.01),
# reflect padding, bilinear align-corners ScaleUp decoder).
# ---------------------------------------------------------------------------

class _SingleConv(nn.Module):
    def __init__(self, cin, cout, k, stride, pad, g):
        super().__init__()
        conv = nn.Conv2d(cin, cout, k, stride=stride, padding=pad,
                         padding_mode="reflect")
        with torch.no_grad():
            conv.weight.copy_(0.3 * torch.randn_like(conv.weight))
            conv.bias.copy_(0.1 * torch.randn_like(conv.bias))
        bn = nn.BatchNorm2d(cout)
        with torch.no_grad():
            bn.weight.copy_(1.0 + 0.1 * torch.randn(cout, generator=g))
            bn.bias.copy_(0.1 * torch.randn(cout, generator=g))
        bn.running_mean = 0.1 * torch.randn(cout, generator=g)
        bn.running_var = 1.0 + 0.2 * torch.rand(cout, generator=g)
        self.conv = nn.Sequential(conv, bn, nn.LeakyReLU(0.01))

    def forward(self, x):
        return self.conv(x)


class _ScaleUp(nn.Module):
    def __init__(self, cin, cout, g):
        super().__init__()
        self.conv = _SingleConv(cin, cout, 3, 1, 1, g)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.conv(x)


class TorchGoldenEncoder(nn.Module):
    """pre=4, down=(8,), post=(6,), up=(8,4), final 1x1 -> 1 channel."""

    def __init__(self, seed=1):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        self.encoder = nn.Module()
        self.encoder.model = nn.ModuleList([
            _SingleConv(1, 4, 7, 1, 3, g),
            _SingleConv(4, 8, 3, 2, 1, g),
            _SingleConv(8, 6, 3, 1, 1, g),
        ])
        final = nn.Conv2d(4, 1, 1)
        with torch.no_grad():
            final.weight.copy_(0.3 * torch.randn_like(final.weight))
            final.bias.copy_(0.1 * torch.randn_like(final.bias))
        self.decoder = nn.Module()
        self.decoder.model = nn.ModuleList([
            _ScaleUp(6, 8, g), _ScaleUp(8, 4, g), final])

    def encode(self, geom, res):
        """geom [B,1,H,W] in [0,1]; returns features per res index."""
        x = (1.0 - geom) * 2.0 - 1.0       # '-11inverse' preproc
        for m in self.encoder.model:
            x = m(x)
        feats = [x]
        for i in range(max(res)):
            x = self.decoder.model[i](x)
            feats.append(x)
        return [feats[r] for r in res]


# ---------------------------------------------------------------------------
# Snapshot construction in the reference persistence-pickle structure.
# ---------------------------------------------------------------------------

def _persist_dict(mod: nn.Module) -> dict:
    return {
        "_parameters": {k: v for k, v in mod._parameters.items()
                        if v is not None},
        "_buffers": {k: v for k, v in mod._buffers.items() if v is not None},
        "_modules": {k: _persist_dict(v) for k, v in mod._modules.items()
                     if v is not None},
    }


def _fake_reconstruct(meta):
    raise RuntimeError("should have been intercepted by the stub unpickler")


_fake_reconstruct.__module__ = "torch_utils.persistence"
_fake_reconstruct.__qualname__ = "_reconstruct_persistent_obj"


class _PersistedModule:
    """Pickles as torch_utils.persistence._reconstruct_persistent_obj(meta),
    exactly like a reference @persistent_class module."""

    def __init__(self, mod: nn.Module):
        self.meta = {"type": "class", "version": 2,
                     "state": _persist_dict(mod)}

    def __reduce__(self):
        return (_fake_reconstruct, (self.meta,))


ENC_ARGS = {
    "model_name": "sauto", "encoder_in_channels": 1,
    "decoder_out_channels": 1, "preproc_type": "-11inverse",
    "encoder_pre_filters": 4, "encoder_down_filters": "8",
    "encoder_post_filters": "6", "decoder_up_filters": "8,4",
    "decoder_pre_filters": -1, "neg_slope": None,
}


def _write_snapshot(path, gen: TorchGolden, enc: TorchGoldenEncoder,
                    args=None):
    snapshot = {
        "G_ema": _PersistedModule(gen),
        "args": args if args is not None else
                {"color_format": "triad", "geom_inject_resolutions": (0,)},
        "encoder": {
            "model_state": {k: v for k, v in enc.state_dict().items()},
            "args": ENC_ARGS,
        },
    }
    mod = types.ModuleType("torch_utils.persistence")
    mod._reconstruct_persistent_obj = _fake_reconstruct
    pkg = types.ModuleType("torch_utils")
    pkg.persistence = mod
    sys.modules["torch_utils"] = pkg
    sys.modules["torch_utils.persistence"] = mod
    try:
        with open(path, "wb") as f:
            pickle.dump(snapshot, f)
    finally:
        del sys.modules["torch_utils"]
        del sys.modules["torch_utils.persistence"]


# ---------------------------------------------------------------------------
# The parity tests.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    torch.manual_seed(0)
    gen = TorchGolden(seed=0).eval()
    enc = TorchGoldenEncoder(seed=1).eval()
    path = str(tmp_path_factory.mktemp("snap") / "network-snapshot.pkl")
    _write_snapshot(path, gen, enc)
    bundle = ckpt.convert_reference_snapshot(path)
    return gen, enc, bundle


def test_easydict_args_preserved(tmp_path):
    """Snapshot `args` arrive as dnnlib.EasyDict (a dict subclass whose data
    lives in the dict itself, so vars() on it is EMPTY).  Regression for the
    r3 bug where the converter vars()'d them away and every multi-injection
    checkpoint silently fell back to geom_inject_resolutions=(0,)."""
    from brushstroke_engine_tpu.utils import torch_extract as tx
    torch.manual_seed(0)
    gen = TorchGolden(seed=0).eval()
    enc = TorchGoldenEncoder(seed=1).eval()
    path = str(tmp_path / "network-snapshot.pkl")
    _write_snapshot(path, gen, enc,
                    args=tx.EasyDict(color_format="triad",
                                     geom_inject_resolutions=[0, 1]))
    bundle = ckpt.convert_reference_snapshot(path)
    assert bundle.geom_inject_resolutions == (0, 1)
    assert bundle.color_format == "triad"


class TestConvertedSnapshotParity:
    def test_config_inference(self, converted):
        _gen, _enc, bundle = converted
        cfg = bundle.gen_cfg
        assert cfg.img_resolution == 16
        assert cfg.z_dim == 8 and cfg.w_dim == 8
        assert cfg.mapping_layers == 2
        assert cfg.synthesis.geom_feature_resolutions == (8,)
        assert cfg.synthesis.geom_feature_channels == (TorchGolden.GEOM_CH,)
        assert cfg.num_ws == TorchGolden.NUM_WS
        assert bundle.color_format == "triad"
        assert bundle.enc_cfg.kind == "sauto"
        assert bundle.enc_cfg.pre_filters == 4
        assert bundle.enc_cfg.up_filters == (8, 4)

    def test_encoder_activation_parity(self, converted):
        _gen, enc, bundle = converted
        rng = np.random.RandomState(0)
        geom = (rng.rand(2, 16, 16, 1) > 0.5).astype(np.float32)
        with torch.no_grad():
            want = enc.encode(torch.from_numpy(
                np.transpose(geom, (0, 3, 1, 2))), res=[0, 1])
        got = geo_encoder_encode(bundle.enc_cfg, bundle.enc_params,
                                 bundle.enc_state, jnp.asarray(geom),
                                 res=[0, 1])
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.transpose(np.asarray(g), (0, 3, 1, 2)), w.numpy(),
                rtol=1e-4, atol=1e-4)

    def test_generator_premapped_ws_parity(self, converted):
        """Distinct per-slot ws exercise the w indexing across blocks."""
        gen, _enc, bundle = converted
        rng = np.random.RandomState(1)
        ws = rng.randn(2, TorchGolden.NUM_WS, 8).astype(np.float32)
        geom8 = rng.randn(2, 8, 8, TorchGolden.GEOM_CH).astype(np.float32)
        with torch.no_grad():
            want = gen(torch.from_numpy(ws),
                       torch.from_numpy(np.transpose(geom8, (0, 3, 1, 2))))
        img, _, _ = generator_apply(
            bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
            ws=jnp.asarray(ws), geom_features=[jnp.asarray(geom8)],
            noise_mode="const")
        np.testing.assert_allclose(
            np.transpose(np.asarray(img), (0, 3, 1, 2)), want.numpy(),
            rtol=1e-3, atol=2e-4)

    def test_full_pipeline_z_to_image_parity(self, converted):
        """z -> mapping -> synthesis with encoder features end-to-end."""
        gen, enc, bundle = converted
        rng = np.random.RandomState(2)
        z = rng.randn(2, 8).astype(np.float32)
        geom = (rng.rand(2, 16, 16, 1) > 0.5).astype(np.float32)
        with torch.no_grad():
            ws_t = gen.map_z(torch.from_numpy(z))
            feats_t = enc.encode(torch.from_numpy(
                np.transpose(geom, (0, 3, 1, 2))), res=[0])
            want = gen(ws_t, feats_t[0])
        feats = geo_encoder_encode(bundle.enc_cfg, bundle.enc_params,
                                   bundle.enc_state, jnp.asarray(geom),
                                   res=[0])
        img, _, _ = generator_apply(
            bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
            z=jnp.asarray(z), geom_features=feats, noise_mode="const")
        np.testing.assert_allclose(
            np.transpose(np.asarray(img), (0, 3, 1, 2)), want.numpy(),
            rtol=1e-3, atol=5e-4)
