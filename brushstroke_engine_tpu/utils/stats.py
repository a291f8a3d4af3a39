"""Cross-device scalar training statistics.

Rebuild of the reference training_stats (torch_utils/training_stats.py:
34-268): moment-accumulating scalar reports with cross-process reduction and
a Collector for mean/std queries.  The SPMD version needs no side-channel
process groups: inside a jitted step, call :func:`report_moments` (optionally
wrapped in ``jax.lax.pmean``) to build the [count, sum, sum-sq] moments, and
accumulate them host-side in a :class:`Collector`.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from typing import Dict

import numpy as np
import jax.numpy as jnp


def report_moments(value) -> jnp.ndarray:
    """[count, sum, sum_sq] moments of a tensor (device-side, traceable)."""
    v = jnp.asarray(value, jnp.float32).reshape(-1)
    return jnp.stack([jnp.float32(v.size), jnp.sum(v),
                      jnp.sum(jnp.square(v))])


class Collector:
    """Accumulates reported moments; answers mean/std queries
    (reference training_stats.Collector, :113-180)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._moments: Dict[str, np.ndarray] = defaultdict(
            lambda: np.zeros(3, np.float64))
        self._cumulative: Dict[str, np.ndarray] = defaultdict(
            lambda: np.zeros(3, np.float64))

    def report(self, name: str, value):
        """Accumulate a scalar / tensor of VALUES under `name`."""
        if not self._regex.match(name):
            return
        flat = np.asarray(value, np.float64).reshape(-1)
        m = np.array([flat.size, flat.sum(), np.square(flat).sum()])
        self._moments[name] += m
        self._cumulative[name] += m

    def report_raw_moments(self, name: str, moments):
        """Accumulate a precomputed [count, sum, sum_sq] vector (e.g. from
        :func:`report_moments` inside a jitted step)."""
        if not self._regex.match(name):
            return
        m = np.asarray(moments, np.float64)
        assert m.shape == (3,)
        self._moments[name] += m
        self._cumulative[name] += m

    def update(self):
        """Roll the accumulation window (reference: delta since last update)."""
        if not self._keep_previous:
            self._moments.clear()

    def names(self):
        return sorted(self._moments.keys())

    def num(self, name: str) -> int:
        return int(self._moments[name][0])

    def mean(self, name: str) -> float:
        m = self._moments[name]
        if m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments[name]
        if m[0] < 2:
            return 0.0
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean * mean, 0.0)
        return math.sqrt(var)

    def __getitem__(self, name: str) -> float:
        return self.mean(name)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {name: {"num": self.num(name), "mean": self.mean(name),
                       "std": self.std(name)}
                for name in self.names()}

    def reset(self):
        self._moments.clear()
