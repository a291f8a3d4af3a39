#!/usr/bin/env python
"""int8-vs-bf16 conv A/B at the flagship synthesis/encoder shapes.

Evidence base for ops/quant.py: on TPU v5e, XLA lowers stride-1 int8
convs onto the double-rate int8 MXU path (1.35-1.39x measured), while
strided convs regress -- hence the quantization gate covers only
unstrided dense convs.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
rng = np.random.RandomState(0)
ITERS = 16

SHAPES = [
    ("enc stage1 64->128 s2 @256^2", (128, 256, 256, 64), (3, 3, 64, 128), 2),
    ("syn 128->128 s1 @128^2", (128, 128, 128, 128), (3, 3, 128, 128), 1),
    ("syn 64->64 s1 @256^2", (128, 256, 256, 64), (3, 3, 64, 64), 1),
]


def bench(name, xs, ws, stride, dtype):
    if dtype == "int8":
        x = jax.device_put(jnp.asarray(
            rng.randint(-127, 127, size=xs), jnp.int8), dev)
        w = jax.device_put(jnp.asarray(
            rng.randint(-127, 127, size=ws), jnp.int8), dev)
        pet = jnp.int32
    else:
        x = jax.device_put(jnp.asarray(rng.randn(*xs), jnp.bfloat16), dev)
        w = jax.device_put(jnp.asarray(rng.randn(*ws) * .05, jnp.bfloat16),
                           dev)
        pet = jnp.float32

    def run(x, w):
        def body(i, acc):
            xi = jnp.roll(x, i, axis=0)
            y = jax.lax.conv_general_dilated(
                xi, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pet)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    jr = jax.jit(run)
    try:
        float(jr(x, w))
    except Exception as e:
        print(json.dumps({"name": name, "dtype": dtype,
                          "error": str(e)[:150]}), flush=True)
        return
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(jr(x, w))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    flop = (2 * np.prod(ws) * (xs[1] // stride) * (xs[2] // stride) * xs[0])
    print(json.dumps({"name": name, "dtype": dtype,
                      "ms": round(best * 1e3, 3),
                      "tops": round(flop / best / 1e12, 1)}), flush=True)


for name, xs, ws, s in SHAPES:
    for dt in ("bf16", "int8"):
        bench(name, xs, ws, s, dt)

def bench_up(name, xs, ws, dtype):
    """2x up-conv via lhs_dilation (modconv up path)."""
    if dtype == "int8":
        x = jax.device_put(jnp.asarray(
            rng.randint(-127, 127, size=xs), jnp.int8), dev)
        w = jax.device_put(jnp.asarray(
            rng.randint(-127, 127, size=ws), jnp.int8), dev)
        pet = jnp.int32
    else:
        x = jax.device_put(jnp.asarray(rng.randn(*xs), jnp.bfloat16), dev)
        w = jax.device_put(jnp.asarray(rng.randn(*ws) * .05, jnp.bfloat16),
                           dev)
        pet = jnp.float32

    def run(x, w):
        def body(i, acc):
            xi = jnp.roll(x, i, axis=0)
            y = jax.lax.conv_general_dilated(
                xi, w, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pet)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    jr = jax.jit(run)
    try:
        float(jr(x, w))
    except Exception as e:
        print(json.dumps({"name": name, "dtype": dtype,
                          "error": str(e)[:150]}), flush=True)
        return
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(jr(x, w))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    flop = 2 * np.prod(ws) * (xs[1] * 2) * (xs[2] * 2) * xs[0]
    print(json.dumps({"name": name, "dtype": dtype,
                      "ms": round(best * 1e3, 3),
                      "tops": round(flop / best / 1e12, 1)}), flush=True)


for dt in ("bf16", "int8"):
    bench_up("up 128->64 2x to 256^2", (128, 128, 128, 128),
             (3, 3, 128, 64), dt)
for dt in ("bf16", "int8"):
    bench_up("up 128->128 2x to 128^2", (128, 64, 64, 128),
             (3, 3, 128, 128), dt)
