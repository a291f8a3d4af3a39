"""Fused bias + activation + gain + clamp.

Functional equivalent of the reference CUDA kernel
(reference: thirdparty/stylegan2_ada_pytorch/torch_utils/ops/bias_act.{cu,py};
executable spec `_bias_act_ref` at bias_act.py:94 and the activation table at
bias_act.py:23-33).

On TPU this is deliberately *plain jnp*: under ``jax.jit`` XLA fuses the
bias-add, activation, gain and clamp into the epilogue of the producing conv /
matmul, which is exactly what the hand-written CUDA kernel achieves on GPU.
Wrapping this in a Pallas kernel would *prevent* that fusion and add an HBM
round-trip.  Arbitrary-order gradients (needed by the R1 / path-length
regularizers) come from XLA autodiff for free -- no `has_2nd_grad` machinery.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class _ActSpec(NamedTuple):
    fn: callable
    def_alpha: float
    def_gain: float


ACTIVATIONS = {
    "linear": _ActSpec(lambda x, a: x, 0.0, 1.0),
    "relu": _ActSpec(lambda x, a: jax.nn.relu(x), 0.0, math.sqrt(2.0)),
    "lrelu": _ActSpec(lambda x, a: jax.nn.leaky_relu(x, a), 0.2, math.sqrt(2.0)),
    "tanh": _ActSpec(lambda x, a: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _ActSpec(lambda x, a: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _ActSpec(lambda x, a: jax.nn.elu(x), 0.0, 1.0),
    "selu": _ActSpec(lambda x, a: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _ActSpec(lambda x, a: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _ActSpec(lambda x, a: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2.0)),
}


def activation_gain(act: str) -> float:
    """Default output gain for an activation (sqrt(2) for relu family)."""
    return ACTIVATIONS[act].def_gain


def bias_act(x, b=None, dim: int = -1, act: str = "linear",
             alpha: Optional[float] = None, gain: Optional[float] = None,
             clamp: Optional[float] = None):
    """Add bias along ``dim``, apply ``act``, scale by ``gain``, clamp.

    Args:
      x: input of any shape (NHWC activations use dim=-1).
      b: 1D bias of length ``x.shape[dim]`` or None.
      dim: axis of ``x`` the bias lives on.  Defaults to -1 (channel axis in
        NHWC) -- note the reference defaults to 1 for its NCHW layout.
      act: one of :data:`ACTIVATIONS`.
      alpha: activation shape parameter (lrelu slope); None = default.
      gain: output scale; None = activation default (sqrt(2) for relu family).
      clamp: clamp output to [-clamp, clamp]; None = no clamping.
    """
    spec = ACTIVATIONS[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)

    if b is not None:
        assert b.ndim == 1
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape).astype(x.dtype)
    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
