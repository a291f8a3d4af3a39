"""Frechet Inception Distance in JAX.

Rebuild of the reference FID path (thirdparty/.../metrics/
frechet_inception_distance.py:53-81 + metric_utils.py:236-286): real
statistics from the style dataset, generated statistics by painting random
styles over dataset geometry in 'full' render mode, Frechet distance between
gaussian fits of pool features.

Feature detector kinds (every metric output should carry the kind label so
random-feature numbers are never mistaken for canonical FID):

* ``inception_v3`` -- the REAL full Inception-v3 (:mod:`..metrics.inception`),
  loaded from torchvision-layout or the reference's TorchScript-layout
  state_dicts via :func:`load_detector`.  With real pretrained weights this
  computes the canonical metric.
* ``random`` -- a light DETERMINISTIC 5-conv stack (:class:`InceptionFeatures`,
  the default when no weights are available -- this environment has no
  network egress).  FID over fixed random features is still a valid
  two-sample discrepancy and is comparable across runs of this codebase,
  but NOT against published FID numbers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from brushstroke_engine_tpu.metrics.inception import (
    InceptionV3, inception_features,
)

# Random-fallback plan: (out_ch, kernel, stride).
_PLAN = [
    (32, 3, 2),
    (64, 3, 2),
    (128, 3, 2),
    (256, 3, 2),
    (512, 3, 2),
]
FEATURE_DIM = 512  # dim of the random-fallback detector (InceptionV3: 2048)


@dataclass
class InceptionFeatures:
    """The ``kind="random"`` fallback detector: a deterministic He-init conv
    stack.  For the real Inception-v3, see :class:`..metrics.inception.
    InceptionV3`; this class deliberately has no weight-loading path."""

    convs: List[Dict[str, jnp.ndarray]]
    kind: str = "random"

    @staticmethod
    def random_init(seed: int = 0) -> "InceptionFeatures":
        # numpy RNG: concrete arrays even when lazily built under a trace.
        rng = np.random.RandomState(seed)
        convs = []
        cin = 3
        for (cout, k, s) in _PLAN:
            std = float(np.sqrt(2.0 / (k * k * cin)))
            convs.append({
                "weight": (std * rng.randn(k, k, cin, cout)).astype(
                    np.float32),
                "bias": np.zeros((cout,), np.float32),
            })
            cin = cout
        return InceptionFeatures(convs=convs)


Detector = Union[InceptionFeatures, InceptionV3]

_DEFAULT: Optional[Detector] = None


def load_detector(path: str) -> InceptionV3:
    """Load a real Inception-v3 detector state_dict (torch .pt/.pth or
    pickle of numpy arrays), auto-detecting the layout: torchvision
    (``Mixed_5b.branch1x1.conv.weight`` keys) or the reference TorchScript
    (``layers.mixed.tower...`` keys, metric_utils.py:253)."""
    state = None
    try:
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        state = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
                 for k, v in obj.items()}
    except Exception:
        pass
    if state is None:
        import pickle
        with open(path, "rb") as f:
            state = {k: np.asarray(v) for k, v in pickle.load(f).items()}
    if any(k.startswith("layers.") for k in state):
        return InceptionV3.from_nvidia_state(state)
    return InceptionV3.from_torchvision_state(state)


def get_default_extractor() -> Detector:
    """Active detector: a real Inception-v3 when ``NEUBE_FID_DETECTOR``
    points at a weights file, else the labeled random fallback."""
    global _DEFAULT
    if _DEFAULT is not None:
        from brushstroke_engine_tpu.utils.util import tree_on_stale_backend
        tree = _DEFAULT.params if isinstance(_DEFAULT, InceptionV3) \
            else _DEFAULT.convs
        if tree_on_stale_backend(tree):
            _DEFAULT = None              # backend was torn down; rebuild
    if _DEFAULT is None:
        from brushstroke_engine_tpu.utils.weights import find_weights
        path = find_weights("inception")
        _DEFAULT = load_detector(path) if path else \
            InceptionFeatures.random_init(0)
        # Commit detector weights to device ONCE: host-numpy leaves would
        # re-stage the full weight set on every feature batch.
        from brushstroke_engine_tpu.utils.util import \
            commit_to_default_device
        if isinstance(_DEFAULT, InceptionV3):
            _DEFAULT.params = commit_to_default_device(_DEFAULT.params)
        else:
            _DEFAULT.convs = commit_to_default_device(_DEFAULT.convs)
    return _DEFAULT


def set_default_extractor(model: Detector):
    global _DEFAULT
    _DEFAULT = model


def default_detector_kind() -> str:
    return get_default_extractor().kind


def extract_features(images, model: Optional[Detector] = None):
    """NHWC uint8/float images -> [B, D] pool features (D = 2048 for the
    real Inception-v3 detector, 512 for the random fallback)."""
    from brushstroke_engine_tpu.ops.precision import conv_precision
    model = model or get_default_extractor()
    if isinstance(model, InceptionV3):
        return inception_features(model, images)
    x = jnp.asarray(images, jnp.float32)
    if x.max() > 1.5:
        x = x / 127.5 - 1.0
    for i, ((cout, k, s), conv) in enumerate(zip(_PLAN, model.convs)):
        p = k // 2
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(conv["weight"]), (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=conv_precision(x.dtype),
            preferred_element_type=jnp.float32) + jnp.asarray(conv["bias"])
        x = jax.nn.relu(x)
    return jnp.mean(x, axis=(1, 2))  # global average pool


class FeatureStats:
    """Streaming mean/covariance accumulator (reference metric_utils
    FeatureStats with capture_mean_cov)."""

    def __init__(self, max_items: Optional[int] = None,
                 dim: Optional[int] = None):
        self.max_items = max_items
        self.num_items = 0
        self.dim = dim
        if dim is not None:
            self._alloc(dim)
        else:
            self.raw_mean = self.raw_cov = None

    def _alloc(self, dim: int):
        self.dim = dim
        self.raw_mean = np.zeros(dim, np.float64)
        self.raw_cov = np.zeros((dim, dim), np.float64)

    def append(self, feats):
        feats = np.asarray(feats, np.float64)
        if self.raw_mean is None:
            self._alloc(feats.shape[1])
        if self.max_items is not None:
            room = self.max_items - self.num_items
            if room <= 0:
                return
            feats = feats[:room]
        self.num_items += feats.shape[0]
        self.raw_mean += feats.sum(axis=0)
        self.raw_cov += feats.T @ feats

    @property
    def is_full(self) -> bool:
        return self.max_items is not None and \
            self.num_items >= self.max_items

    def get_mean_cov(self):
        if self.raw_mean is None:
            self._alloc(FEATURE_DIM)
        mean = self.raw_mean / max(self.num_items, 1)
        cov = self.raw_cov / max(self.num_items, 1) - np.outer(mean, mean)
        return mean, cov


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """Standard FID formula (reference frechet_inception_distance.py:44-50)."""
    import scipy.linalg
    m = np.square(mu1 - mu2).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma1, sigma2), disp=False)
    dist = m + np.trace(sigma1 + sigma2 - 2 * np.real(s))
    return float(np.real(dist))


def compute_fid_from_feature_stats(stats_real: FeatureStats,
                                   stats_gen: FeatureStats) -> float:
    mu_r, sig_r = stats_real.get_mean_cov()
    mu_g, sig_g = stats_gen.get_mean_cov()
    return frechet_distance(mu_g, sig_g, mu_r, sig_r)


def kernel_inception_distance(feats_real: np.ndarray, feats_gen: np.ndarray,
                              num_subsets: int = 10,
                              max_subset_size: int = 1000,
                              seed: int = 0) -> float:
    """KID: polynomial-kernel MMD over pool features (the reference's metric
    zoo includes kid.py; reference train.py:220 restricts training-time
    metrics to fid+forger but the standalone metric remains available)."""
    rng = np.random.RandomState(seed)
    n = feats_real.shape[1]
    m = min(feats_real.shape[0], feats_gen.shape[0], max_subset_size)
    t = 0.0
    for _ in range(num_subsets):
        x = feats_gen[rng.choice(feats_gen.shape[0], m, replace=False)]
        y = feats_real[rng.choice(feats_real.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


def inception_score(feats: np.ndarray, num_splits: int = 10) -> float:
    """IS over softmax of pool features (metric-zoo parity; see KID note)."""
    probs = np.exp(feats - feats.max(1, keepdims=True))
    probs = probs / probs.sum(1, keepdims=True)
    scores = []
    n = probs.shape[0]
    for i in range(num_splits):
        part = probs[i * n // num_splits:(i + 1) * n // num_splits]
        if len(part) == 0:
            continue
        kl = part * (np.log(part + 1e-12)
                     - np.log(part.mean(0, keepdims=True) + 1e-12))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores))


def fid_from_image_iterables(real_batches: Iterable, gen_batches: Iterable,
                             max_items: Optional[int] = None,
                             model: Optional[InceptionFeatures] = None
                             ) -> float:
    """FID between two streams of NHWC image batches."""
    sr = FeatureStats(max_items)
    sg = FeatureStats(max_items)
    for batch in real_batches:
        sr.append(extract_features(batch, model))
        if sr.is_full:
            break
    for batch in gen_batches:
        sg.append(extract_features(batch, model))
        if sg.is_full:
            break
    return compute_fid_from_feature_stats(sr, sg)
