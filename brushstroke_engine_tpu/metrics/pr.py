"""Improved precision & recall for generative models (Kynkaanniemi 2019).

Rebuild of the reference metric
(thirdparty/stylegan2_ada_pytorch/metrics/precision_recall.py:19-62):
for each of (precision: manifold=real, probes=gen) and (recall:
manifold=gen, probes=real), estimate the manifold as the union of
hyperspheres around each manifold feature with radius equal to its
k-th-nearest-neighbour distance (k = ``nhood_size``), then report the
fraction of probe features falling inside any hypersphere.

TPU notes: all pairwise work is chunked batched matmuls
(``|a|^2 + |b|^2 - 2ab``) so it lands on the MXU; we compare SQUARED
distances throughout, which is monotonic in the euclidean distances the
reference uses, so the coverage predicate ``dist <= kth`` is bit-identical.
The kth neighbour is taken with ``lax.top_k`` on negated distances
(self-distance 0 included, hence ``k+1`` values), matching the reference's
``kthvalue(nhood_size + 1)``.

Feature detector: the reference downloads a VGG16 trained on ImageNet
(precision_recall.py:37).  :class:`VGG16Features` accepts a torchvision
``vgg16`` state dict when one is available; without network egress a
DETERMINISTIC slim random-init stack is used (same doctrine as
``fid.InceptionFeatures`` -- random-feature coverage is still a valid
two-sample statistic and comparable across runs of this codebase).  By
default :func:`compute_pr_from_images` uses the shared Inception-style
extractor from :mod:`.fid` so training-time FID and PR reuse one feature
pass.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fid as _fid

# Torchvision VGG16 conv plan ('M' = 2x2 maxpool); features feed two
# 4096-wide ReLU fc layers (classifier.0 / classifier.3).
_VGG_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
_SLIM_DIV = 8           # fallback width divisor (keeps weights small)
_SLIM_FC = 512


@dataclass
class VGG16Features:
    convs: List[Dict[str, np.ndarray]]
    fcs: List[Dict[str, np.ndarray]]
    width_div: int = 1

    @property
    def kind(self) -> str:
        """Detector-kind label for metric logs: a loaded full-width VGG16
        vs the slim random fallback."""
        return "vgg16" if self.width_div == 1 else "vgg16_random"

    @staticmethod
    def random_init(seed: int = 0) -> "VGG16Features":
        # numpy RNG: concrete arrays even when lazily built under a trace.
        rng = np.random.RandomState(seed)
        convs, cin = [], 3
        for spec in _VGG_PLAN:
            if spec == "M":
                continue
            cout = int(spec) // _SLIM_DIV
            std = float(np.sqrt(2.0 / (9 * cin)))
            convs.append({
                "weight": (std * rng.randn(3, 3, cin, cout)).astype(
                    np.float32),
                "bias": np.zeros((cout,), np.float32)})
            cin = cout
        fcs = []
        fin = cin * 7 * 7
        for fout in (_SLIM_FC, _SLIM_FC):
            std = float(np.sqrt(2.0 / fin))
            fcs.append({
                "weight": (std * rng.randn(fin, fout)).astype(np.float32),
                "bias": np.zeros((fout,), np.float32)})
            fin = fout
        return VGG16Features(convs=convs, fcs=fcs, width_div=_SLIM_DIV)

    @staticmethod
    def from_torch_state(state: Dict[str, np.ndarray]) -> "VGG16Features":
        """torchvision ``vgg16().state_dict()`` (features.N / classifier.N)."""
        convs = []
        idxs = sorted({int(k.split(".")[1]) for k in state
                       if k.startswith("features.")})
        for i in idxs:
            w = np.asarray(state[f"features.{i}.weight"])       # OIHW
            convs.append({
                "weight": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
                "bias": np.asarray(state[f"features.{i}.bias"],
                                   np.float32)})
        fcs = []
        for i in (0, 3):
            w = np.asarray(state[f"classifier.{i}.weight"])     # [out, in]
            if i == 0:
                # torch flattens the 7x7x512 pool as (C, H, W); our NHWC
                # extractor flattens (H, W, C) -> permute the input dim.
                out_f = w.shape[0]
                c = w.shape[1] // 49
                w = w.reshape(out_f, c, 7, 7).transpose(0, 2, 3, 1) \
                    .reshape(out_f, -1)
            fcs.append({
                "weight": w.T.astype(np.float32),
                "bias": np.asarray(state[f"classifier.{i}.bias"],
                                   np.float32)})
        return VGG16Features(convs=convs, fcs=fcs, width_div=1)


def vgg16_extract_features(images, model: VGG16Features):
    """NHWC uint8/float images -> [B, fc-width] ReLU features.

    Mirrors the reference detector's ``return_features=True`` output (the
    second 4096-wide fc activation).  Images are resized to 224 with the
    same bilinear resize used across this codebase.
    """
    from brushstroke_engine_tpu.ops.precision import conv_precision

    x = jnp.asarray(images, jnp.float32)
    if x.max() > 1.5:
        x = x / 255.0
    if x.shape[1] != 224 or x.shape[2] != 224:
        x = jax.image.resize(x, (x.shape[0], 224, 224, x.shape[3]),
                             method="bilinear")
    ci = 0
    for spec in _VGG_PLAN:
        if spec == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
            continue
        conv = model.convs[ci]
        ci += 1
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(conv["weight"]), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=conv_precision(x.dtype),
            preferred_element_type=jnp.float32) + jnp.asarray(conv["bias"])
        x = jax.nn.relu(x)
    x = x.reshape(x.shape[0], -1)
    for fc in model.fcs:
        x = jax.nn.relu(x @ jnp.asarray(fc["weight"])
                        + jnp.asarray(fc["bias"]))
    return x


@jax.jit
def _sq_dists(rows, cols):
    """Chunk of squared pairwise distances, [m,d] x [n,d] -> [m,n]."""
    rn = jnp.sum(rows * rows, axis=-1)[:, None]
    cn = jnp.sum(cols * cols, axis=-1)[None, :]
    return jnp.maximum(rn + cn - 2.0 * rows @ cols.T, 0.0)


def _pad_rows(x: np.ndarray, bs: int) -> np.ndarray:
    pad = (-len(x)) % bs
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def _kth_sq(manifold: np.ndarray, k: int, row_bs: int) -> np.ndarray:
    """Squared distance to each manifold point's k-th neighbour."""
    n = len(manifold)
    man_j = jnp.asarray(manifold)
    rows = _pad_rows(manifold, row_bs)
    out = []
    for i in range(0, len(rows), row_bs):
        d = _sq_dists(jnp.asarray(rows[i:i + row_bs]), man_j)
        neg, _ = jax.lax.top_k(-d, k + 1)   # k+1: self-distance 0 included
        out.append(np.asarray(-neg[:, -1]))
    return np.concatenate(out)[:n]


def _coverage(probes: np.ndarray, manifold: np.ndarray, kth_sq: np.ndarray,
              row_bs: int) -> float:
    n = len(probes)
    man_j = jnp.asarray(manifold)
    kth_j = jnp.asarray(kth_sq)[None, :]
    rows = _pad_rows(probes, row_bs)
    hits = []
    for i in range(0, len(rows), row_bs):
        d = _sq_dists(jnp.asarray(rows[i:i + row_bs]), man_j)
        hits.append(np.asarray(jnp.any(d <= kth_j, axis=1)))
    return float(np.concatenate(hits)[:n].mean())


def compute_pr(real_features, gen_features, nhood_size: int = 3,
               row_batch_size: int = 4096) -> Tuple[float, float]:
    """(precision, recall) from feature arrays (reference
    precision_recall.py:50-61; nhood_size=3 is the pr50k3 config)."""
    real = np.asarray(real_features, np.float32)
    gen = np.asarray(gen_features, np.float32)
    out = {}
    for name, manifold, probes in [("precision", real, gen),
                                   ("recall", gen, real)]:
        kth = _kth_sq(manifold, nhood_size, row_batch_size)
        out[name] = _coverage(probes, manifold, kth, row_batch_size)
    return out["precision"], out["recall"]


def compute_pr_from_images(real_batches: Iterable, gen_batches: Iterable,
                           max_items: Optional[int] = None,
                           nhood_size: int = 3,
                           model=None,
                           vgg: Optional[VGG16Features] = None
                           ) -> Tuple[float, float]:
    """(precision, recall) between two streams of NHWC image batches.

    Uses the shared Inception-style pool features by default (one
    detector for FID+PR); pass ``vgg`` to use a loaded VGG16 instead.
    """
    def _collect(batches):
        feats, total = [], 0
        for b in batches:
            if vgg is not None:
                f = vgg16_extract_features(b, vgg)
            else:
                f = _fid.extract_features(b, model)
            feats.append(np.asarray(f))
            total += len(feats[-1])
            if max_items and total >= max_items:
                break
        f = np.concatenate(feats)
        return f[:max_items] if max_items else f

    return compute_pr(_collect(real_batches), _collect(gen_batches),
                      nhood_size=nhood_size)
