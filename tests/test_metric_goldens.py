"""Torch-golden activation parity for the LPIPS and VGG16 weight
converters (the Inception-v3 and CLIP equivalents live in
test_inception.py / test_clip_model.py).

The goldens implement the documented math in raw torch (lpips-package
AlexNet + NetLinLayer semantics; torchvision VGG16 layout) -- built here,
not imported -- so loading REAL published weights into our extractors
reproduces the canonical metrics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional


class TestLPIPSGolden:
    """lpips-package AlexNet layout: net.slice{k}.{idx}.weight convs,
    lin{k}.model.1.weight 1x1 calibrations applied RAW to squared diffs."""

    # (state key prefix, out_ch, in_ch, k, stride, pad)
    CONVS = [
        ("net.slice1.0", 64, 3, 11, 4, 2),
        ("net.slice2.3", 192, 64, 5, 1, 2),
        ("net.slice3.6", 384, 192, 3, 1, 1),
        ("net.slice4.8", 256, 384, 3, 1, 1),
        ("net.slice5.10", 256, 256, 3, 1, 1),
    ]
    SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def _state(self, seed=0):
        rng = np.random.RandomState(seed)
        state = {}
        for (pre, co, ci, k, _s, _p) in self.CONVS:
            std = np.sqrt(2.0 / (k * k * ci))
            state[f"{pre}.weight"] = (std * rng.randn(co, ci, k, k)) \
                .astype(np.float32)
            state[f"{pre}.bias"] = 0.1 * rng.randn(co).astype(np.float32)
        for i, (_pre, co, *_r) in enumerate(self.CONVS):
            state[f"lin{i}.model.1.weight"] = np.abs(
                rng.randn(1, co, 1, 1)).astype(np.float32) / co
        return state

    def _torch_lpips(self, state, x, y):
        """x, y: NCHW in [-1, 1]."""

        def feats(img):
            h = (img - self.SHIFT) / self.SCALE
            out = []
            for i, (pre, _co, _ci, _k, s, p) in enumerate(self.CONVS):
                h = F.relu(F.conv2d(
                    h, torch.from_numpy(state[f"{pre}.weight"]),
                    torch.from_numpy(state[f"{pre}.bias"]),
                    stride=s, padding=p))
                norm = (h.square().sum(dim=1, keepdim=True) + 1e-10).rsqrt()
                out.append(h * norm)
                if i in (0, 1):
                    h = F.max_pool2d(h, 3, stride=2)
            return out

        fx, fy = feats(x), feats(y)
        total = torch.zeros(x.shape[0])
        for i, (f1, f2) in enumerate(zip(fx, fy)):
            lin = torch.from_numpy(state[f"lin{i}.model.1.weight"])
            d = F.conv2d((f1 - f2).square(), lin)       # NetLinLayer
            total = total + d.mean(dim=(2, 3)).squeeze(1)
        return total

    def test_lpips_parity(self):
        from brushstroke_engine_tpu.metrics.lpips import (
            LPIPSModel, lpips_pair,
        )
        state = self._state(0)
        model = LPIPSModel.from_torch_state(state)
        rng = np.random.RandomState(1)
        x = (rng.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
        y = (rng.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
        with torch.no_grad():
            want = self._torch_lpips(
                state, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))).numpy()
        got = np.asarray(lpips_pair(jnp.asarray(x), jnp.asarray(y), model))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestVGG16Golden:
    """torchvision vgg16 layout at quarter width (same structure, 13 convs
    + 2 fc): the NCHW-flatten permutation of classifier.0 must be handled
    by the converter."""

    def _state(self, seed=0, div=4):
        from brushstroke_engine_tpu.metrics.pr import _VGG_PLAN
        rng = np.random.RandomState(seed)
        state = {}
        cin, li = 3, 0
        for spec in _VGG_PLAN:
            if spec == "M":
                li += 1
                continue
            co = int(spec) // div
            std = np.sqrt(2.0 / (9 * cin))
            state[f"features.{li}.weight"] = \
                (std * rng.randn(co, cin, 3, 3)).astype(np.float32)
            state[f"features.{li}.bias"] = \
                0.1 * rng.randn(co).astype(np.float32)
            cin = co
            li += 2
        fin = cin * 7 * 7
        for i, fout in ((0, 512), (3, 512)):
            std = np.sqrt(2.0 / fin)
            state[f"classifier.{i}.weight"] = \
                (std * rng.randn(fout, fin)).astype(np.float32)
            state[f"classifier.{i}.bias"] = \
                0.1 * rng.randn(fout).astype(np.float32)
            fin = fout
        return state

    def _torch_vgg(self, state, x):
        """x: NCHW float [0,1] at 224px -> second-fc ReLU features."""
        from brushstroke_engine_tpu.metrics.pr import _VGG_PLAN
        h = x
        li = 0
        for spec in _VGG_PLAN:
            if spec == "M":
                h = F.max_pool2d(h, 2, stride=2)
                li += 1
                continue
            h = F.relu(F.conv2d(
                h, torch.from_numpy(state[f"features.{li}.weight"]),
                torch.from_numpy(state[f"features.{li}.bias"]), padding=1))
            li += 2
        h = h.flatten(1)                                 # NCHW flatten
        for i in (0, 3):
            h = F.relu(F.linear(
                h, torch.from_numpy(state[f"classifier.{i}.weight"]),
                torch.from_numpy(state[f"classifier.{i}.bias"])))
        return h

    def test_vgg16_parity(self):
        from brushstroke_engine_tpu.metrics.pr import (
            VGG16Features, vgg16_extract_features,
        )
        state = self._state(0)
        vgg = VGG16Features.from_torch_state(state)
        assert vgg.kind == "vgg16"
        rng = np.random.RandomState(1)
        imgs = rng.rand(2, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            want = self._torch_vgg(
                state,
                torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))).numpy()
        got = np.asarray(vgg16_extract_features(jnp.asarray(imgs), vgg))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
