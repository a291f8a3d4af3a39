"""Inception-v3 detector: architecture spec + torch-golden activation parity.

The torch model below is built from the documented Inception-v3 math
(Szegedy 2015; torchvision layout/naming) -- NOT imported from torchvision
(absent in this image) or from the reference.  It exists to produce an
independent golden: save its state_dict in the torchvision layout, convert
with ``InceptionV3.from_torchvision_state``, and assert the JAX forward
matches the torch forward on random inputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from brushstroke_engine_tpu.metrics.inception import (
    CONVS, PARAM_COUNT, POOL_DIM, InceptionV3, inception_features,
    _nvidia_name_map,
)

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x):
    # TF-weights semantics (pytorch-fid): count_include_pad=False.
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg3(x))
        return torch.cat([b1, b5, b3, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        bp = self.branch_pool(_avg3(x))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3,
                  self.branch7x7x3_4):
            b7 = m(b7)
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class InceptionE(nn.Module):
    def __init__(self, cin, pool_max):
        super().__init__()
        self.pool_max = pool_max
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)],
                       1)
        if self.pool_max:
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg3(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInceptionV3(nn.Module):
    """Feature extractor trunk in torchvision naming (golden)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, pool_max=False)
        self.Mixed_7c = InceptionE(2048, pool_max=True)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


def _randomized_golden(seed=0):
    torch.manual_seed(seed)
    model = TorchInceptionV3().eval()
    # Non-trivial BN statistics so the parity test exercises the BN math.
    g = torch.Generator().manual_seed(seed + 1)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = 0.1 * torch.randn(
                m.num_features, generator=g)
            m.running_var = (1.0 + 0.2 * torch.rand(
                m.num_features, generator=g))
            with torch.no_grad():
                m.weight += 0.1 * torch.randn(m.num_features, generator=g)
                m.bias += 0.1 * torch.randn(m.num_features, generator=g)
    return model


class TestArchitectureSpec:
    def test_conv_count_and_param_count(self):
        assert len(CONVS) == 94
        model = _randomized_golden()
        torch_params = sum(p.numel() for n, p in model.named_parameters())
        assert PARAM_COUNT == torch_params
        # The canonical Inception-v3 trunk is ~21.8M parameters.
        assert 21_000_000 < PARAM_COUNT < 23_000_000

    def test_nvidia_map_covers_every_conv(self):
        m = _nvidia_name_map()
        assert set(m.keys()) == {name for (name, *_r) in CONVS}
        assert len(set(m.values())) == len(m)

    def test_random_init_labeled(self):
        model = InceptionV3.random_init(0)
        assert model.kind == "inception_v3_random"
        assert model.param_count() == PARAM_COUNT


class TestTorchGoldenParity:
    def test_torchvision_layout_activation_parity(self):
        golden = _randomized_golden(0)
        state = {k: v.detach().numpy() for k, v in
                 golden.state_dict().items()}
        model = InceptionV3.from_torchvision_state(state)
        assert model.kind == "inception_v3"

        # 75px input keeps every block's spatial math valid (stem reduces
        # 75 -> 7 like 299 -> 35) at ~16x less CPU work than 299px.
        rng = np.random.RandomState(0)
        x = rng.randn(2, 75, 75, 3).astype(np.float32)
        with torch.no_grad():
            ref = golden(torch.from_numpy(
                np.transpose(x, (0, 3, 1, 2)))).numpy()
        got = np.asarray(inception_features(
            model, jnp.asarray(x), preprocessed=True))
        assert got.shape == (2, POOL_DIM)
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    def test_nvidia_layout_converter(self):
        """The reference-TorchScript layout (folded BN) maps onto the same
        forward: build the nvidia-layout state from a torch golden whose BN
        has been folded into conv weights + beta biases, and check parity
        against the torch golden itself."""
        golden = _randomized_golden(1)
        nv_state = {}
        nv_map = _nvidia_name_map()
        tv_state = golden.state_dict()
        for tv_name, nv_name in nv_map.items():
            w = tv_state[f"{tv_name}.conv.weight"].detach().numpy()
            scale = tv_state[f"{tv_name}.bn.weight"].detach().numpy()
            bias = tv_state[f"{tv_name}.bn.bias"].detach().numpy()
            mean = tv_state[f"{tv_name}.bn.running_mean"].detach().numpy()
            var = tv_state[f"{tv_name}.bn.running_var"].detach().numpy()
            inv = scale / np.sqrt(var + 1e-3)
            nv_state[f"layers.{nv_name}.conv.weight"] = \
                w * inv[:, None, None, None]
            nv_state[f"layers.{nv_name}.beta"] = bias - mean * inv
        model = InceptionV3.from_nvidia_state(nv_state)
        assert model.kind == "inception_v3"

        rng = np.random.RandomState(1)
        x = rng.randn(1, 75, 75, 3).astype(np.float32)
        with torch.no_grad():
            ref = golden(torch.from_numpy(
                np.transpose(x, (0, 3, 1, 2)))).numpy()
        got = np.asarray(inception_features(
            model, jnp.asarray(x), preprocessed=True))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


class TestPipelineIntegration:
    def test_fid_pipeline_with_inception_detector(self):
        """The FID pipeline runs with the real-architecture detector and
        labels it; identical streams give ~0 FID."""
        from brushstroke_engine_tpu.metrics import fid as fid_lib
        model = InceptionV3.random_init(0)
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, size=(4, 64, 64, 3)).astype(np.uint8)
        feats = np.asarray(fid_lib.extract_features(imgs, model))
        assert feats.shape == (4, POOL_DIM)
        sr = fid_lib.FeatureStats(dim=POOL_DIM)
        sg = fid_lib.FeatureStats(dim=POOL_DIM)
        noise = rng.randn(*feats.shape)
        sr.append(feats + noise)
        sg.append(feats + noise)
        # sqrtm on a rank-4 2048x2048 covariance carries ~1e-2 numerical
        # noise even for identical statistics; assert near-zero, not zero.
        assert abs(fid_lib.compute_fid_from_feature_stats(sr, sg)) < 0.1
