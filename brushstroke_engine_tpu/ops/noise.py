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

    r0 = jnp.floor(row_c).astype(jnp.int32)
    c0 = jnp.floor(col_c).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, r_l - 1)
    c1 = jnp.minimum(c0 + 1, r_l - 1)
    wr = (row_c - r0)[:, None, :]   # [B, 1, R_l]  weight along j
    wc = (col_c - c0)[:, :, None]   # [B, R_l, 1]  weight along i

    n = noise_const.astype(jnp.float32)

    def gather(rr, cc):
        # out[b, i, j] = n[rr[b, j], cc[b, i]]
        return n[rr[:, None, :], cc[:, :, None]]

    out = ((1 - wr) * (1 - wc) * gather(r0, c0)
           + (1 - wr) * wc * gather(r0, c1)
           + wr * (1 - wc) * gather(r1, c0)
           + wr * wc * gather(r1, c1))
    return out[..., None]
