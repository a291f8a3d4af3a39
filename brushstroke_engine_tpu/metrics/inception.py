"""Full Inception-v3 feature extractor (2048-d pool3) in JAX.

This is the real detector behind FID/KID/IS in the reference
(thirdparty/stylegan2_ada_pytorch/metrics/metric_utils.py:253 loads an
Inception-v3 TorchScript and feeds its 2048-d pool features to
frechet_inception_distance.py:53-81).  We re-implement the architecture
natively -- stem, InceptionA/B/C/D/E towers, global average pool -- as a
functional JAX program over an explicit parameter dict, so the whole
extraction jits into one XLA program per batch shape.

Two weight layouts convert into it:

* ``from_torchvision_state``: the torchvision ``inception_v3`` state_dict
  layout (``Mixed_5b.branch1x1.conv.weight`` + BatchNorm tensors).  This is
  the layout used by the standard pytorch-fid implementation and is the one
  we can validate end-to-end: ``tests/test_inception.py`` builds the same
  architecture in raw torch from the documented math and asserts activation
  parity against this module.
* ``from_nvidia_state``: the reference's TorchScript detector layout
  (``layers.mixed_4.tower.conv_1.conv.weight`` + folded-BN ``beta`` biases,
  i.e. the TF-2015 "pool_3" network NVIDIA ships).  Mapping table below.

Without real weights (this environment has no network egress) use
``random_init`` -- the full architecture with He-init weights, labeled
``kind="inception_v3_random"`` so metric logs can never be mistaken for
canonical FID numbers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

POOL_DIM = 2048
_BN_EPS = 1e-3

# ---------------------------------------------------------------------------
# Architecture table: every BasicConv2d in torchvision naming/order.
# Entry: (name, cin, cout, (kh, kw), (sh, sw), (ph, pw)).


def _convs_spec() -> List[Tuple[str, int, int, Tuple[int, int],
                                Tuple[int, int], Tuple[int, int]]]:
    spec = []

    def c(name, cin, cout, k, s=1, p=0):
        k = (k, k) if isinstance(k, int) else k
        p = (p, p) if isinstance(p, int) else p
        spec.append((name, cin, cout, k, (s, s), p))

    # Stem
    c("Conv2d_1a_3x3", 3, 32, 3, s=2)
    c("Conv2d_2a_3x3", 32, 32, 3)
    c("Conv2d_2b_3x3", 32, 64, 3, p=1)
    c("Conv2d_3b_1x1", 64, 80, 1)
    c("Conv2d_4a_3x3", 80, 192, 3)

    def inception_a(name, cin, pool_features):
        c(f"{name}.branch1x1", cin, 64, 1)
        c(f"{name}.branch5x5_1", cin, 48, 1)
        c(f"{name}.branch5x5_2", 48, 64, 5, p=2)
        c(f"{name}.branch3x3dbl_1", cin, 64, 1)
        c(f"{name}.branch3x3dbl_2", 64, 96, 3, p=1)
        c(f"{name}.branch3x3dbl_3", 96, 96, 3, p=1)
        c(f"{name}.branch_pool", cin, pool_features, 1)

    def inception_b(name, cin):
        c(f"{name}.branch3x3", cin, 384, 3, s=2)
        c(f"{name}.branch3x3dbl_1", cin, 64, 1)
        c(f"{name}.branch3x3dbl_2", 64, 96, 3, p=1)
        c(f"{name}.branch3x3dbl_3", 96, 96, 3, s=2)

    def inception_c(name, cin, c7):
        c(f"{name}.branch1x1", cin, 192, 1)
        c(f"{name}.branch7x7_1", cin, c7, 1)
        c(f"{name}.branch7x7_2", c7, c7, (1, 7), p=(0, 3))
        c(f"{name}.branch7x7_3", c7, 192, (7, 1), p=(3, 0))
        c(f"{name}.branch7x7dbl_1", cin, c7, 1)
        c(f"{name}.branch7x7dbl_2", c7, c7, (7, 1), p=(3, 0))
        c(f"{name}.branch7x7dbl_3", c7, c7, (1, 7), p=(0, 3))
        c(f"{name}.branch7x7dbl_4", c7, c7, (7, 1), p=(3, 0))
        c(f"{name}.branch7x7dbl_5", c7, 192, (1, 7), p=(0, 3))
        c(f"{name}.branch_pool", cin, 192, 1)

    def inception_d(name, cin):
        c(f"{name}.branch3x3_1", cin, 192, 1)
        c(f"{name}.branch3x3_2", 192, 320, 3, s=2)
        c(f"{name}.branch7x7x3_1", cin, 192, 1)
        c(f"{name}.branch7x7x3_2", 192, 192, (1, 7), p=(0, 3))
        c(f"{name}.branch7x7x3_3", 192, 192, (7, 1), p=(3, 0))
        c(f"{name}.branch7x7x3_4", 192, 192, 3, s=2)

    def inception_e(name, cin):
        c(f"{name}.branch1x1", cin, 320, 1)
        c(f"{name}.branch3x3_1", cin, 384, 1)
        c(f"{name}.branch3x3_2a", 384, 384, (1, 3), p=(0, 1))
        c(f"{name}.branch3x3_2b", 384, 384, (3, 1), p=(1, 0))
        c(f"{name}.branch3x3dbl_1", cin, 448, 1)
        c(f"{name}.branch3x3dbl_2", 448, 384, 3, p=1)
        c(f"{name}.branch3x3dbl_3a", 384, 384, (1, 3), p=(0, 1))
        c(f"{name}.branch3x3dbl_3b", 384, 384, (3, 1), p=(1, 0))
        c(f"{name}.branch_pool", cin, 192, 1)

    inception_a("Mixed_5b", 192, 32)
    inception_a("Mixed_5c", 256, 64)
    inception_a("Mixed_5d", 288, 64)
    inception_b("Mixed_6a", 288)
    inception_c("Mixed_6b", 768, 128)
    inception_c("Mixed_6c", 768, 160)
    inception_c("Mixed_6d", 768, 160)
    inception_c("Mixed_6e", 768, 192)
    inception_d("Mixed_7a", 768)
    inception_e("Mixed_7b", 1280)
    inception_e("Mixed_7c", 2048)
    return spec


CONVS = _convs_spec()
_CONV_INDEX = {name: i for i, (name, *_rest) in enumerate(CONVS)}

#: Total parameter count of the feature extractor (conv weights + BN
#: scale/bias), the architecture-spec invariant tests assert against.
PARAM_COUNT = sum(kh * kw * cin * cout + 2 * cout
                  for (_n, cin, cout, (kh, kw), _s, _p) in CONVS)


@dataclass
class InceptionV3:
    """Parameters + semantics toggles for the extractor.

    ``params[name]`` holds ``w`` (HWIO conv weight) plus batch-norm tensors
    ``scale``/``bias``/``mean``/``var`` (identity-BN for folded layouts).
    ``count_include_pad`` selects torch's AvgPool2d default (True) vs the
    TF-weights semantics pytorch-fid restores (False).
    ``mixed_7c_pool_max``: the reference TF-2015 detector uses max pooling
    in Mixed_7c's pool branch (pytorch-fid FIDInceptionE_2).
    """

    params: Dict[str, Dict[str, jnp.ndarray]]
    kind: str = "inception_v3"
    bn_eps: float = _BN_EPS
    count_include_pad: bool = True
    mixed_7c_pool_max: bool = False
    input_range: str = "tf"  # "tf": 2x-1 ; "torchvision": imagenet mean/std

    @staticmethod
    def random_init(seed: int = 0) -> "InceptionV3":
        rng = np.random.RandomState(seed)
        params = {}
        for (name, cin, cout, (kh, kw), _s, _p) in CONVS:
            std = float(np.sqrt(2.0 / (kh * kw * cin)))
            params[name] = {
                "w": (std * rng.randn(kh, kw, cin, cout)).astype(np.float32),
                "scale": np.ones((cout,), np.float32),
                "bias": np.zeros((cout,), np.float32),
                "mean": np.zeros((cout,), np.float32),
                "var": np.ones((cout,), np.float32),
            }
        return InceptionV3(params=params, kind="inception_v3_random")

    @staticmethod
    def from_torchvision_state(state: Dict[str, np.ndarray]) -> "InceptionV3":
        """Convert a torchvision ``inception_v3`` state_dict (OIHW convs +
        BatchNorm2d tensors; ``fc``/``AuxLogits`` entries ignored)."""
        params = {}
        for (name, cin, cout, (kh, kw), _s, _p) in CONVS:
            w = np.asarray(state[f"{name}.conv.weight"], np.float32)
            if w.shape != (cout, cin, kh, kw):
                raise ValueError(
                    f"{name}: weight shape {w.shape} != "
                    f"{(cout, cin, kh, kw)}")
            params[name] = {
                "w": np.transpose(w, (2, 3, 1, 0)),
                "scale": np.asarray(state[f"{name}.bn.weight"], np.float32),
                "bias": np.asarray(state[f"{name}.bn.bias"], np.float32),
                "mean": np.asarray(
                    state[f"{name}.bn.running_mean"], np.float32),
                "var": np.asarray(
                    state[f"{name}.bn.running_var"], np.float32),
            }
        return InceptionV3(params=params, kind="inception_v3",
                           count_include_pad=False, mixed_7c_pool_max=True)

    @staticmethod
    def from_nvidia_state(state: Dict[str, np.ndarray]) -> "InceptionV3":
        """Convert the reference TorchScript detector's state_dict (the
        TF-2015 network: ``layers.<node>.conv.weight`` OIHW + folded-BN
        ``layers.<node>.beta`` biases)."""
        params = {}
        for tv_name, nv_name in _nvidia_name_map().items():
            (_n, cin, cout, (kh, kw), _s, _p) = CONVS[_CONV_INDEX[tv_name]]
            w = np.asarray(state[f"layers.{nv_name}.conv.weight"], np.float32)
            if w.shape != (cout, cin, kh, kw):
                raise ValueError(
                    f"{tv_name} <- layers.{nv_name}: weight shape {w.shape}"
                    f" != {(cout, cin, kh, kw)}")
            params[tv_name] = {
                "w": np.transpose(w, (2, 3, 1, 0)),
                "scale": np.ones((cout,), np.float32),
                "bias": np.asarray(state[f"layers.{nv_name}.beta"],
                                   np.float32),
                "mean": np.zeros((cout,), np.float32),
                "var": np.ones((cout,), np.float32),
            }
        return InceptionV3(params=params, kind="inception_v3", bn_eps=0.0,
                           count_include_pad=False, mixed_7c_pool_max=True)

    def param_count(self) -> int:
        return sum(int(np.prod(p["w"].shape)) + 2 * p["w"].shape[-1]
                   for p in self.params.values())


def _nvidia_name_map() -> Dict[str, str]:
    """torchvision conv name -> NVIDIA TorchScript node name.

    TF graph naming: stem convs are conv..conv_4; 35x35 blocks mixed..mixed_2;
    17x17 reduction mixed_3; 17x17 blocks mixed_4..mixed_7; 8x8 reduction
    mixed_8; 8x8 blocks mixed_9, mixed_10.  Branches are conv / tower /
    tower_1 / tower_2 with conv_N members; InceptionE's split 1x3/3x1 pairs
    live under ``tower.mixed`` / ``tower_1.mixed``.
    """
    m = {
        "Conv2d_1a_3x3": "conv", "Conv2d_2a_3x3": "conv_1",
        "Conv2d_2b_3x3": "conv_2", "Conv2d_3b_1x1": "conv_3",
        "Conv2d_4a_3x3": "conv_4",
    }
    for tv, nv in (("Mixed_5b", "mixed"), ("Mixed_5c", "mixed_1"),
                   ("Mixed_5d", "mixed_2")):
        m.update({
            f"{tv}.branch1x1": f"{nv}.conv",
            f"{tv}.branch5x5_1": f"{nv}.tower.conv",
            f"{tv}.branch5x5_2": f"{nv}.tower.conv_1",
            f"{tv}.branch3x3dbl_1": f"{nv}.tower_1.conv",
            f"{tv}.branch3x3dbl_2": f"{nv}.tower_1.conv_1",
            f"{tv}.branch3x3dbl_3": f"{nv}.tower_1.conv_2",
            f"{tv}.branch_pool": f"{nv}.tower_2.conv",
        })
    m.update({
        "Mixed_6a.branch3x3": "mixed_3.conv",
        "Mixed_6a.branch3x3dbl_1": "mixed_3.tower.conv",
        "Mixed_6a.branch3x3dbl_2": "mixed_3.tower.conv_1",
        "Mixed_6a.branch3x3dbl_3": "mixed_3.tower.conv_2",
    })
    for tv, nv in (("Mixed_6b", "mixed_4"), ("Mixed_6c", "mixed_5"),
                   ("Mixed_6d", "mixed_6"), ("Mixed_6e", "mixed_7")):
        m.update({
            f"{tv}.branch1x1": f"{nv}.conv",
            f"{tv}.branch7x7_1": f"{nv}.tower.conv",
            f"{tv}.branch7x7_2": f"{nv}.tower.conv_1",
            f"{tv}.branch7x7_3": f"{nv}.tower.conv_2",
            f"{tv}.branch7x7dbl_1": f"{nv}.tower_1.conv",
            f"{tv}.branch7x7dbl_2": f"{nv}.tower_1.conv_1",
            f"{tv}.branch7x7dbl_3": f"{nv}.tower_1.conv_2",
            f"{tv}.branch7x7dbl_4": f"{nv}.tower_1.conv_3",
            f"{tv}.branch7x7dbl_5": f"{nv}.tower_1.conv_4",
            f"{tv}.branch_pool": f"{nv}.tower_2.conv",
        })
    m.update({
        "Mixed_7a.branch3x3_1": "mixed_8.tower.conv",
        "Mixed_7a.branch3x3_2": "mixed_8.tower.conv_1",
        "Mixed_7a.branch7x7x3_1": "mixed_8.tower_1.conv",
        "Mixed_7a.branch7x7x3_2": "mixed_8.tower_1.conv_1",
        "Mixed_7a.branch7x7x3_3": "mixed_8.tower_1.conv_2",
        "Mixed_7a.branch7x7x3_4": "mixed_8.tower_1.conv_3",
    })
    for tv, nv in (("Mixed_7b", "mixed_9"), ("Mixed_7c", "mixed_10")):
        m.update({
            f"{tv}.branch1x1": f"{nv}.conv",
            f"{tv}.branch3x3_1": f"{nv}.tower.conv",
            f"{tv}.branch3x3_2a": f"{nv}.tower.mixed.conv",
            f"{tv}.branch3x3_2b": f"{nv}.tower.mixed.conv_1",
            f"{tv}.branch3x3dbl_1": f"{nv}.tower_1.conv",
            f"{tv}.branch3x3dbl_2": f"{nv}.tower_1.conv_1",
            f"{tv}.branch3x3dbl_3a": f"{nv}.tower_1.mixed.conv",
            f"{tv}.branch3x3dbl_3b": f"{nv}.tower_1.mixed.conv_1",
            f"{tv}.branch_pool": f"{nv}.tower_2.conv",
        })
    return m


# ---------------------------------------------------------------------------
# Forward pass.


def _conv_bn_relu(model: InceptionV3, name: str, x: jnp.ndarray
                  ) -> jnp.ndarray:
    from brushstroke_engine_tpu.ops.precision import conv_precision
    (_n, _cin, _cout, _k, stride, pad) = CONVS[_CONV_INDEX[name]]
    p = model.params[name]
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["w"]), stride,
        ((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=conv_precision(x.dtype),
        preferred_element_type=jnp.float32)
    inv = jnp.asarray(p["scale"]) * jax.lax.rsqrt(
        jnp.asarray(p["var"]) + model.bn_eps)
    x = (x - jnp.asarray(p["mean"])) * inv + jnp.asarray(p["bias"])
    return jax.nn.relu(x)


def _max_pool(x, k=3, s=2, p=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (p, p), (p, p), (0, 0)))


def _avg_pool_3x3(x, count_include_pad: bool):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / n


def _block_a(model, name, x):
    b1 = _conv_bn_relu(model, f"{name}.branch1x1", x)
    b5 = _conv_bn_relu(model, f"{name}.branch5x5_1", x)
    b5 = _conv_bn_relu(model, f"{name}.branch5x5_2", b5)
    b3 = _conv_bn_relu(model, f"{name}.branch3x3dbl_1", x)
    b3 = _conv_bn_relu(model, f"{name}.branch3x3dbl_2", b3)
    b3 = _conv_bn_relu(model, f"{name}.branch3x3dbl_3", b3)
    bp = _avg_pool_3x3(x, model.count_include_pad)
    bp = _conv_bn_relu(model, f"{name}.branch_pool", bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(model, name, x):
    b3 = _conv_bn_relu(model, f"{name}.branch3x3", x)
    bd = _conv_bn_relu(model, f"{name}.branch3x3dbl_1", x)
    bd = _conv_bn_relu(model, f"{name}.branch3x3dbl_2", bd)
    bd = _conv_bn_relu(model, f"{name}.branch3x3dbl_3", bd)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(model, name, x):
    b1 = _conv_bn_relu(model, f"{name}.branch1x1", x)
    b7 = _conv_bn_relu(model, f"{name}.branch7x7_1", x)
    b7 = _conv_bn_relu(model, f"{name}.branch7x7_2", b7)
    b7 = _conv_bn_relu(model, f"{name}.branch7x7_3", b7)
    bd = _conv_bn_relu(model, f"{name}.branch7x7dbl_1", x)
    for i in (2, 3, 4, 5):
        bd = _conv_bn_relu(model, f"{name}.branch7x7dbl_{i}", bd)
    bp = _avg_pool_3x3(x, model.count_include_pad)
    bp = _conv_bn_relu(model, f"{name}.branch_pool", bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(model, name, x):
    b3 = _conv_bn_relu(model, f"{name}.branch3x3_1", x)
    b3 = _conv_bn_relu(model, f"{name}.branch3x3_2", b3)
    b7 = _conv_bn_relu(model, f"{name}.branch7x7x3_1", x)
    for i in (2, 3, 4):
        b7 = _conv_bn_relu(model, f"{name}.branch7x7x3_{i}", b7)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(model, name, x, pool_max: bool):
    b1 = _conv_bn_relu(model, f"{name}.branch1x1", x)
    b3 = _conv_bn_relu(model, f"{name}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _conv_bn_relu(model, f"{name}.branch3x3_2a", b3),
        _conv_bn_relu(model, f"{name}.branch3x3_2b", b3)], axis=-1)
    bd = _conv_bn_relu(model, f"{name}.branch3x3dbl_1", x)
    bd = _conv_bn_relu(model, f"{name}.branch3x3dbl_2", bd)
    bd = jnp.concatenate([
        _conv_bn_relu(model, f"{name}.branch3x3dbl_3a", bd),
        _conv_bn_relu(model, f"{name}.branch3x3dbl_3b", bd)], axis=-1)
    if pool_max:
        bp = _max_pool(x, k=3, s=1, p=1)
    else:
        bp = _avg_pool_3x3(x, model.count_include_pad)
    bp = _conv_bn_relu(model, f"{name}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def preprocess(images, input_range: str = "tf") -> jnp.ndarray:
    """NHWC uint8/[0,255]/[0,1] images (any H,W; 1 or 3 channels) ->
    299x299x3 normalized float32."""
    x = jnp.asarray(images, jnp.float32)
    x = jnp.where(jnp.max(jnp.abs(x)) > 1.5, x / 255.0, x)
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
    if x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
    if input_range == "torchvision":
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        return (x - mean) / std
    return 2.0 * x - 1.0


def inception_features(model: InceptionV3, images,
                       preprocessed: bool = False) -> jnp.ndarray:
    """Images -> [B, 2048] pool3 features."""
    x = images if preprocessed else preprocess(images, model.input_range)
    x = _conv_bn_relu(model, "Conv2d_1a_3x3", x)
    x = _conv_bn_relu(model, "Conv2d_2a_3x3", x)
    x = _conv_bn_relu(model, "Conv2d_2b_3x3", x)
    x = _max_pool(x)
    x = _conv_bn_relu(model, "Conv2d_3b_1x1", x)
    x = _conv_bn_relu(model, "Conv2d_4a_3x3", x)
    x = _max_pool(x)
    x = _block_a(model, "Mixed_5b", x)
    x = _block_a(model, "Mixed_5c", x)
    x = _block_a(model, "Mixed_5d", x)
    x = _block_b(model, "Mixed_6a", x)
    x = _block_c(model, "Mixed_6b", x)
    x = _block_c(model, "Mixed_6c", x)
    x = _block_c(model, "Mixed_6d", x)
    x = _block_c(model, "Mixed_6e", x)
    x = _block_d(model, "Mixed_7a", x)
    x = _block_e(model, "Mixed_7b", x, pool_max=False)
    x = _block_e(model, "Mixed_7c", x, pool_max=model.mixed_7c_pool_max)
    return jnp.mean(x, axis=(1, 2))
