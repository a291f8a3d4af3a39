"""Pallas kernel: fused ADA two-pass affine warp (weights never touch HBM).

The XLA two-pass form (`train/augment.py:_affine_warp_twopass`) is fast on
the MXU but materializes per-sample ``[H, W_out, W_in]`` interpolation
matrices -- ~270 MB per call at B=64/128px bf16 -- so the ADA augment is
pure data movement (measured 132 GB/s, 6.2 ms, ~16% of the training cycle;
docs/ARCHITECTURE.md round-3 roofline).  This kernel computes the SAME
triangle-kernel weights on-chip per row/column block and applies them
immediately, so HBM sees only the images themselves (~25 MB per call).

Capability parity anchor: the reference applies its geometric ADA warp as
upfirdn2d-up -> grid_sample -> upfirdn2d-down
(thirdparty/stylegan2_ada_pytorch/training/augment.py geometric section);
this is the TPU-native formulation of that antialiased warp (see the
two-pass notes in train/augment.py).

Layout strategy, per the Mosaic constraints catalogued in
`ops/pallas_fir.py` (lane extents want multiples of 128, sublane slice
offsets multiples of 8, no lane-dim shape casts):

* images ride as ``[B, H, C, W]`` so the 128-aligned spatial axis is the
  lane dimension and the small channel axis never lands in a minor dim;
* pass 1 (horizontal resample) is an 8-row-blocked BATCHED MATMUL on the
  MXU: weights ``[8, W_out, W_in]`` are built in VMEM from a broadcasted
  iota and contracted with the ``[8, C, W_in]`` image block;
* pass 2 (vertical resample) is a per-output-row broadcast-multiply +
  SUBLANE reduction on the VPU (contracting the 128-row axis of the
  intermediate kept entirely in VMEM scratch);
* every scratch/output write is an 8-row-aligned block.

The warp is linear in the image, so the custom VJP applies the transposed
weights with the same two stages in reverse order (weights recomputed,
nothing saved but the 8 pass scalars).  The cotangent for the pass-scalar
pack is ZERO: ADA transform matrices are pure functions of the RNG draw
and are never differentiated (matching the XLA path's use).

Ships DISABLED by default; enable with :func:`set_pallas_warp_enabled`.
On-chip A/B (docs/ARCHITECTURE.md round-3 roofline table): 1.76x over
XLA for the strict-f32 128px forward and always f32-accurate, but in
the production fast/bf16 training config XLA's half-traffic einsum is
already near the bandwidth bound and the full-cycle effect is noise
(685 vs 688 imgs/s), so the default stays off.

Multi-chip caveat: a ``pallas_call`` has no GSPMD partitioning rule, so
under a mesh-sharded jit (the ``--dp`` fused step) the call must be
wrapped in ``shard_map`` over the batch axis -- per-sample independence
makes that trivially correct, but the wrapper needs the mesh, which the
augment pipe does not see.  Until the single-chip A/B justifies it, the
kernel is for single-device (or per-shard) use; do not combine
``set_pallas_warp_enabled(True)`` with ``TrainingLoop(mesh=...)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ENABLED = False
_RB = 8              # row block: min float32 sublane tile


def set_pallas_warp_enabled(enabled: bool):
    global _ENABLED
    _ENABLED = bool(enabled)


def pallas_warp_enabled() -> bool:
    return _ENABLED


def warp_eligible(images) -> bool:
    b, h, w, c = images.shape
    return h == w and w % 128 == 0 and c <= 8


def _reflect(v, n):
    # Reflect-101 padding into [0, n-1]; must match augment._affine_warp.
    period = 2.0 * (n - 1)
    v = jnp.mod(v, period)
    return jnp.where(v > (n - 1.0), period - v, v)


def _unpack(s_ref, i):
    # s_ref is the WHOLE [B, 8] scalar pack in SMEM (Mosaic rejects
    # per-batch-row SMEM blocks: sublane block extents must be 8-divisible
    # or whole); row selection happens here via the grid index.
    f32 = jnp.float32
    a1 = s_ref[i, 0].astype(f32)
    b1 = s_ref[i, 1].astype(f32)
    c1 = s_ref[i, 2].astype(f32)
    inv1 = 1.0 / s_ref[i, 3].astype(f32)
    d2 = s_ref[i, 4].astype(f32)
    e2 = s_ref[i, 5].astype(f32)
    c2 = s_ref[i, 6].astype(f32)
    inv2 = 1.0 / s_ref[i, 7].astype(f32)
    return a1, b1, c1, inv1, d2, e2, c2, inv2


def _iota_f32(shape, dim):
    # Mosaic's tpu.iota only produces integers; build int32 and cast.
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim) \
        .astype(jnp.float32)


def _pass1_weights(r0, a1, b1, c1, inv1, w):
    """[_RB, W_out(j), W_in(k)] triangle rows for intermediate rows r0..r0+8."""
    f32 = jnp.float32
    rr = _iota_f32((_RB, w), 0) + r0.astype(f32)
    jj = _iota_f32((_RB, w), 1)
    u = _reflect(b1 * rr + a1 * jj + c1, w)                 # [RB, Wj]
    kk = _iota_f32((_RB, w, w), 2)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(kk - u[:, :, None]) * inv1)
    return wgt / jnp.maximum(wgt.sum(-1, keepdims=True), 1e-8)


def _pass2_weights(i_idx, d2, e2, c2, inv2, h, w, rgrid):
    """[H_in(r), W(j)] triangle column weights for output row i_idx."""
    f32 = jnp.float32
    jrow = _iota_f32((1, w), 1)
    v = _reflect(e2 * i_idx.astype(f32) + d2 * jrow + c2, h)    # [1, W]
    w2 = jnp.maximum(0.0, 1.0 - jnp.abs(rgrid - v) * inv2)      # [Hr, W]
    return w2 / jnp.maximum(w2.sum(0, keepdims=True), 1e-8)


def _fwd_kernel(x_ref, s_ref, o_ref, i1, row_buf):
    _, h, c, w = x_ref.shape
    from jax.experimental import pallas as pl
    f32 = jnp.float32
    a1, b1, c1, inv1, d2, e2, c2, inv2 = _unpack(s_ref, pl.program_id(0))

    def pass1(rb, carry):
        r0 = rb * _RB
        wgt = _pass1_weights(r0, a1, b1, c1, inv1, w)
        xb = x_ref[0, pl.ds(r0, _RB)].astype(f32)           # [RB, C, Wk]
        i1[pl.ds(r0, _RB)] = jax.lax.dot_general(
            xb, wgt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)                     # [RB, C, Wj]
        return carry

    jax.lax.fori_loop(0, h // _RB, pass1, 0)

    rgrid = _iota_f32((h, w), 0)
    i1v = i1[...]                                           # [Hr, C, W]

    def pass2(ib, carry):
        i0 = ib * _RB
        for di in range(_RB):
            w2 = _pass2_weights(i0 + di, d2, e2, c2, inv2, h, w, rgrid)
            row_buf[di] = jnp.sum(w2[:, None, :] * i1v, axis=0)  # [C, W]
        o_ref[0, pl.ds(i0, _RB)] = row_buf[...]
        return carry

    jax.lax.fori_loop(0, h // _RB, pass2, 0)


def _bwd_kernel(g_ref, s_ref, o_ref, i1b):
    _, h, c, w = g_ref.shape
    from jax.experimental import pallas as pl
    f32 = jnp.float32
    a1, b1, c1, inv1, d2, e2, c2, inv2 = _unpack(s_ref, pl.program_id(0))

    # Pass 2 transpose: i1_bar[r,c,j] = sum_i w2[i,r,j] * g[i,c,j],
    # accumulated over 8-row cotangent blocks in a VMEM-value carry.
    rgrid = _iota_f32((h, w), 0)

    def pass2t(ib, acc):
        i0 = ib * _RB
        gb = g_ref[0, pl.ds(i0, _RB)].astype(f32)           # [RB, C, W]
        for di in range(_RB):
            w2 = _pass2_weights(i0 + di, d2, e2, c2, inv2, h, w, rgrid)
            acc = acc + w2[:, None, :] * gb[di][None]       # [Hr, C, W]
        return acc

    i1b[...] = jax.lax.fori_loop(
        0, h // _RB, pass2t, jnp.zeros((h, c, w), f32))

    # Pass 1 transpose: x_bar[r,c,k] = sum_j w1[r,j,k] * i1_bar[r,c,j].
    def pass1t(rb, carry):
        r0 = rb * _RB
        wgt = _pass1_weights(r0, a1, b1, c1, inv1, w)       # [RB, Wj, Wk]
        bb = i1b[pl.ds(r0, _RB)]                            # [RB, C, Wj]
        o_ref[0, pl.ds(r0, _RB)] = jax.lax.dot_general(
            bb, wgt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)                     # [RB, C, Wk]
        return carry

    jax.lax.fori_loop(0, h // _RB, pass1t, 0)


def _call(kernel, x, scalars, extra_scratch):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, c, w = x.shape
    scratch = [pltpu.VMEM((h, c, w), jnp.float32)] + extra_scratch
    flops = 2 * b * 2 * h * w * w * c            # two dense 1-D passes
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, c, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, c, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * 4, transcendentals=0),
    )(x, scalars)


@jax.custom_vjp
def _warp_prepped(imgs, scalars):
    """imgs [B,H,W,C] float32 (already quarter-turn-factored), scalars
    [B,8] from ``train.augment._twopass_prep``.  Returns the warped batch."""
    from jax.experimental.pallas import tpu as pltpu
    b, h, w, c = imgs.shape
    x = jnp.transpose(imgs, (0, 1, 3, 2))                   # [B,H,C,W]
    out = _call(_fwd_kernel, x, scalars,
                [pltpu.VMEM((_RB, c, w), jnp.float32)])
    return jnp.transpose(out, (0, 1, 3, 2))


@jax.custom_vjp
def _warp_transposed(g, scalars):
    """Apply the TRANSPOSED warp W^T to a cotangent batch [B,H,W,C]."""
    gt = jnp.transpose(g, (0, 1, 3, 2))                     # [B,H,C,W]
    xbar = _call(_bwd_kernel, gt, scalars, [])
    return jnp.transpose(xbar, (0, 1, 3, 2))


# The warp is linear in the image, so W and W^T are each other's VJP and
# only the scalar pack is needed to replay the weights.  Defining BOTH
# directions as custom_vjp's of each other makes the pair differentiable
# to arbitrary order (the Dr1 phase reverse-diffs through the backward
# pass: D(aug(x)) -> grad wrt x -> grad of the penalty wrt D params).
# Scalar-pack cotangents are zero by design (module docstring): ADA
# matrices are pure RNG functions and never differentiated.
def _warp_fwd(imgs, scalars):
    return _warp_prepped(imgs, scalars), scalars


def _warp_bwd(scalars, g):
    return (_warp_transposed(g.astype(jnp.float32), scalars),
            jnp.zeros_like(scalars))


def _warp_t_fwd(g, scalars):
    return _warp_transposed(g, scalars), scalars


def _warp_t_bwd(scalars, h):
    return (_warp_prepped(h.astype(jnp.float32), scalars),
            jnp.zeros_like(scalars))


_warp_prepped.defvjp(_warp_fwd, _warp_bwd)
_warp_transposed.defvjp(_warp_t_fwd, _warp_t_bwd)


def affine_warp_twopass_pallas(images, mat, antialias=True):
    """Drop-in for ``augment._affine_warp_twopass`` on eligible shapes
    (square, width a multiple of 128).  Same math, weights never leave
    VMEM; always computes in float32 regardless of the precision mode."""
    from brushstroke_engine_tpu.train.augment import _twopass_prep
    imgs, sc = _twopass_prep(images, mat, antialias)
    out = _warp_prepped(imgs.astype(jnp.float32), sc.astype(jnp.float32))
    return out.astype(images.dtype)
