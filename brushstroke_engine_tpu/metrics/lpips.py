"""Learned Perceptual Image Patch Similarity (LPIPS) in JAX.

Rebuild of the reference's LPIPS usage (forger/metrics/geom_metric.py:312-338
caches `lpips` package models; losses/metrics call ``lpips_batched``).

The network is the standard AlexNet-style feature stack with per-layer unit
normalization and linear calibration weights.  Pretrained torch weights can
be loaded from an `lpips`-package state dict via :func:`LPIPSModel.from_torch_
state`; in environments without the pretrained weights (no network egress),
a DETERMINISTIC randomly-initialized feature stack is used instead -- random
conv features are a documented, usable perceptual proxy (Zhang et al. 2018
report random-weight LPIPS variants correlate with human judgments well above
pixel metrics).  All comparative metrics in this codebase only ever compare
LPIPS values computed with the same model, so the fallback preserves metric
ordering even though absolute values differ from the torch reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet conv stack: (out_ch, kernel, stride, pad)
_ALEX_PLAN = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after these conv indices (stride-2, k3)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclass
class LPIPSModel:
    convs: List[Dict[str, jnp.ndarray]]   # weight [kh,kw,in,out], bias [out]
    lins: List[jnp.ndarray]               # per-layer calibration [C]

    @staticmethod
    def random_init(seed: int = 0) -> "LPIPSModel":
        # numpy RNG: must yield CONCRETE arrays even if first touched inside
        # a jit trace (a lazily-created default model must not cache tracers).
        rng = np.random.RandomState(seed)
        convs = []
        cin = 3
        for (cout, k, s, p) in _ALEX_PLAN:
            std = float(np.sqrt(2.0 / (k * k * cin)))
            convs.append({
                "weight": (std * rng.randn(k, k, cin, cout)).astype(
                    np.float32),
                "bias": np.zeros((cout,), np.float32),
            })
            cin = cout
        # Raw-application semantics (see lpips_pair): 1/c keeps the
        # per-layer contribution scale of the previous fallback.
        lins = [np.ones((c,), np.float32) / c for (c, *_rest) in _ALEX_PLAN]
        return LPIPSModel(convs=convs, lins=lins)

    @staticmethod
    def from_torch_state(state: Dict[str, np.ndarray]) -> "LPIPSModel":
        """Build from an `lpips` package AlexNet state dict (torch layouts)."""
        convs = []
        # lpips package names: net.slice{i}.{j}.weight / lin{i}.model.1.weight
        conv_keys = sorted([k for k in state if k.endswith(".weight")
                            and ".slice" in k])
        for k in conv_keys:
            w = np.asarray(state[k])
            if w.ndim != 4:
                continue
            b = np.asarray(state[k.replace(".weight", ".bias")])
            convs.append({
                "weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(b),
            })
        lins = []
        for i in range(len(_ALEX_PLAN)):
            for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
                if cand in state:
                    lins.append(jnp.asarray(
                        np.asarray(state[cand]).reshape(-1)))
                    break
        assert len(convs) == len(_ALEX_PLAN) and len(lins) == len(_ALEX_PLAN)
        return LPIPSModel(convs=convs, lins=lins)


_DEFAULT_MODEL: Optional[LPIPSModel] = None


def get_default_model() -> LPIPSModel:
    """Real LPIPS-Alex when installed (utils.weights registry), else the
    labeled random fallback."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is not None:
        from brushstroke_engine_tpu.utils.util import tree_on_stale_backend
        if tree_on_stale_backend(_DEFAULT_MODEL.convs):
            _DEFAULT_MODEL = None        # backend was torn down; rebuild
    if _DEFAULT_MODEL is None:
        from brushstroke_engine_tpu.utils.weights import find_weights
        path = find_weights("lpips")
        if path:
            import torch
            obj = torch.load(path, map_location="cpu", weights_only=False)
            state = obj.get("state_dict", obj) if isinstance(obj, dict) \
                else obj.state_dict()
            _DEFAULT_MODEL = LPIPSModel.from_torch_state(
                {k: v.numpy() for k, v in state.items()})
        else:
            _DEFAULT_MODEL = LPIPSModel.random_init(0)
        # Device-resident weights: avoid per-batch host->device re-staging.
        from brushstroke_engine_tpu.utils.util import \
            commit_to_default_device
        _DEFAULT_MODEL.convs = commit_to_default_device(_DEFAULT_MODEL.convs)
        _DEFAULT_MODEL.lins = commit_to_default_device(_DEFAULT_MODEL.lins)
    return _DEFAULT_MODEL


def set_default_model(model: LPIPSModel):
    global _DEFAULT_MODEL
    _DEFAULT_MODEL = model


def _features(model: LPIPSModel, x):
    """x: [B, H, W, 3] in [-1, 1] -> list of normalized feature maps."""
    from brushstroke_engine_tpu.ops.precision import conv_precision
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    for i, ((cout, k, s, p), conv) in enumerate(zip(_ALEX_PLAN, model.convs)):
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(conv["weight"]), (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=conv_precision(x.dtype),
            preferred_element_type=jnp.float32) + jnp.asarray(conv["bias"])
        x = jax.nn.relu(x)
        # Unit-normalize channels.
        norm = jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=-1,
                                     keepdims=True) + 1e-10)
        feats.append(x * norm)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID")
    return feats


def lpips_pair(x, y, model: Optional[LPIPSModel] = None):
    """LPIPS distance between NHWC image batches in [-1, 1] -> [B]."""
    model = model or get_default_model()
    # The AlexNet stride/pool chain produces zero-size maps (-> nan means)
    # below ~32px; upsample tiny toy inputs to the minimum working size.
    if x.shape[1] < 32 or x.shape[2] < 32:
        shape = (x.shape[0], max(32, x.shape[1]), max(32, x.shape[2]),
                 x.shape[3])
        x = jax.image.resize(x, shape, method="bilinear")
        y = jax.image.resize(y, shape, method="bilinear")
    fx = _features(model, x.astype(jnp.float32))
    fy = _features(model, y.astype(jnp.float32))
    total = 0.0
    for f1, f2, lin in zip(fx, fy, model.lins):
        # The lpips package applies the calibration weights RAW (a 1x1
        # conv over the squared diff, NetLinLayer), not squared.
        d = jnp.square(f1 - f2) * jnp.asarray(lin)[None, None, None, :]
        total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
    return total


def lpips_batched(x, y, model: Optional[LPIPSModel] = None):
    """API-compatible with reference lpips_batched (geom_metric.py:312):
    accepts NHWC [-1,1] batches, returns per-item distances [B]."""
    return lpips_pair(x, y, model)
