"""Global matmul/conv precision policy.

TPU convs on float32 inputs default to bf16 passes; that breaks golden-test
parity but is the right choice for production throughput.  Two modes:

  * 'strict' (default): float32 operands use Precision.HIGHEST (true f32,
    6-pass) -- used by tests and checkpoint-parity checks.
  * 'fast': DEFAULT precision everywhere -- used by benchmarks and serving;
    the perf path feeds bf16 activations anyway, where DEFAULT is native.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_MODE = "strict"


def set_precision_mode(mode: str):
    global _MODE
    assert mode in ("strict", "fast")
    _MODE = mode


def get_precision_mode() -> str:
    return _MODE


@contextlib.contextmanager
def precision_mode(mode: str):
    global _MODE
    old = _MODE
    set_precision_mode(mode)
    try:
        yield
    finally:
        _MODE = old


def conv_precision(dtype) -> jax.lax.Precision:
    if _MODE == "strict" and dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT
