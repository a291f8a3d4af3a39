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

    # TPU-first: the coordinate grids are uniform shifts, c(t) = (t + s)
    # mod p with a single fractional shift s per axis (p = r_l - 1), so the
    # whole sample is a fractional 2D circular shift of the texture: take
    # contiguous dynamic_slices of period-p tilings (TPU-fast) and
    # bilinear-blend the four integer-shifted corner views.
    #
    # Bilinear corner values, derived to match grid_sample exactly: for an
    # output cell with coordinate c = (a + f), a = floor(c) in [0, p-1],
    # the two taps are texture[a] and texture[a + 1] where a + 1 may be p
    # (the LAST texel) -- the coordinates live in [0, p) but the texture has
    # p + 1 texels, so the '+1' corner is NOT the periodic wrap to texel 0.
    # Hence the +1 corner views tile T[1 : p+1] (period p), not T[0 : p].
    # (Round-5 fix: the previous single-window formulation wrapped the +1
    # tap of texel p-1 to texel 0, diverging from the reference by one
    # noise row/column per period -- caught by
    # TestStitchAndFinetuneParity::test_gstitch_updates via noise_strength
    # gradient sign flips.)
    p = r_l - 1
    s_row = row_c[:, 0]                             # [B] in [0, p): x shift
    s_col = col_c[:, 0]                             # [B] in [0, p): y shift
    k_row = jnp.floor(s_row).astype(jnp.int32)
    k_col = jnp.floor(s_col).astype(jnp.int32)
    f_row = (s_row - k_row)[:, None, None]
    f_col = (s_col - k_col)[:, None, None]

    # out[b, i, j] = N[row = c(j, x), col = c(i, y)] (reference's transposed
    # indexing); transpose once so the first axis follows i, second j.
    m = noise_const.T.astype(jnp.float32)           # [r_l, r_l] (i-major)

    def tile2(x):
        # Period-p tiling of a [p, p] block to [2p+1, 2p+1]: slice starts
        # k <= p-1 with window r_l = p+1 end at 2p, in range (dynamic_slice
        # clamps out-of-range starts, which would corrupt wraps).
        rows = jnp.concatenate([x, x, x[:1]], axis=0)
        return jnp.concatenate([rows, rows, rows[:, :1]], axis=1)

    corners = [tile2(m[di:di + p, dj:dj + p])       # [2p+1, 2p+1] each
               for di in (0, 1) for dj in (0, 1)]

    def slice_all(kc, kr):
        return [jax.lax.dynamic_slice(t, (kc, kr), (r_l, r_l))
                for t in corners]

    c00, c01, c10, c11 = jax.vmap(slice_all)(k_col, k_row)  # [B, r_l, r_l]
    out = ((1 - f_col) * (1 - f_row) * c00
           + (1 - f_col) * f_row * c01
           + f_col * (1 - f_row) * c10
           + f_col * f_row * c11)
    return out[..., None]
