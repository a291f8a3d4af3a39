"""Device-resident training data: decode once, sample on-chip.

The reference feeds training through torch DataLoader workers (CPU decode
per batch, host->device copy per phase).  The host on a TPU VM slice is
often the scarce resource -- on a 1-vCPU host the two-stream (style +
triband geometry) PNG decode rate sits BELOW the chip's ~650 imgs/s
training rate, so the reference-shaped pipeline is input-bound, and every
step additionally ships ~25 MB of float batches over PCIe.

TPU-native alternative: NeuBE-scale style/geometry zips are small (a few
thousand pre-sized patches -- patch_augment.py output), so the WHOLE
dataset fits in HBM as uint8.  We decode each image exactly once at
startup, commit two uint8 banks to the device, and the fused train step
samples its batch on-chip (gather by random index + float conversion +
crop), leaving the host with nothing to do per step but fold a PRNG key
and pick crop offsets.

Semantics note: the host pipeline re-crops oversized source images every
epoch (dataset.py resize_mode='crop'); the banks freeze one decode per
image, so per-epoch re-crop diversity is traded away unless the zips are
pre-sized patches (the standard NeuBE data-prep output).  Sampling is
i.i.d. WITH replacement (one uniform randint per slot) rather than the
host BatchIterator's shuffled-epoch permutation; over a GAN run of
thousands of epochs the empirical visit counts are indistinguishable.  The random
training-resolution crop of the triband image (reference
training_loop_modified.py:393-426) is NOT affected -- it happens on-chip
every step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# Refuse banks that would crowd out model + optimizer + activations.
DEFAULT_MAX_BANK_BYTES = 6 << 30


@dataclass
class DeviceBanks:
    """Two uint8 image banks committed to the accelerator (replicated over
    the mesh when one is given)."""
    style: jax.Array            # [Ns, r, r, 3] uint8
    tri: jax.Array              # [Ng, H, W, 3] uint8 triband
    tri_hw: Tuple[int, int]     # host-known (H, W) for crop sampling


def _replicated_put(x: np.ndarray, mesh) -> jax.Array:
    if mesh is None:
        return jnp.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P())     # replicated
    if jax.process_count() > 1:
        # Fully-replicated spec: each process provides the full array.
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)


def build_device_banks(style_ds, geom_ds, mesh=None,
                       max_bytes: int = DEFAULT_MAX_BANK_BYTES,
                       log_fn=None) -> DeviceBanks:
    """Decode every image of both datasets once and commit uint8 banks.

    Args:
      style_ds / geom_ds: indexable datasets returning uint8 HWC images
        (``ImageFolderDataset`` or anything len()-able and uniform-shaped).
      mesh: optional ``jax.sharding.Mesh``; banks are replicated over it.
      max_bytes: refuse larger banks (HBM budget guard).
    """
    style = np.stack([style_ds[i] for i in range(len(style_ds))])
    tri = np.stack([geom_ds[i] for i in range(len(geom_ds))])
    if style.dtype != np.uint8 or tri.dtype != np.uint8:
        raise ValueError("device banks expect uint8 image datasets")
    nbytes = style.nbytes + tri.nbytes
    if nbytes > max_bytes:
        raise ValueError(
            f"dataset too large for device residency: {nbytes / 2**30:.2f} "
            f"GiB > {max_bytes / 2**30:.2f} GiB budget; train without "
            f"--device_dataset")
    if log_fn is not None:
        log_fn(f"device banks: {len(style)} style + {len(tri)} geometry "
               f"images, {nbytes / 2**20:.1f} MiB uint8 in HBM")
    return DeviceBanks(style=_replicated_put(style, mesh),
                       tri=_replicated_put(tri, mesh),
                       tri_hw=(int(tri.shape[1]), int(tri.shape[2])))


def sample_banks(style_bank: jax.Array, tri_bank: jax.Array, key: jax.Array,
                 batch_size: int, mesh=None):
    """On-device batch draw (call INSIDE a jitted step).

    Returns (style [B,r,r,3] float in [-1,1], tri [B,H,W,3] float in [0,1])
    -- the same value semantics as dataset.style_batch_to_float /
    geom_batch_to_float.  With a mesh, the gathered batches are constrained
    to the ``data`` axis so the surrounding DP step shards them instead of
    replicating the whole-batch compute.
    """
    ks, kg = jax.random.split(key)
    idx_s = jax.random.randint(ks, (batch_size,), 0, style_bank.shape[0])
    idx_g = jax.random.randint(kg, (batch_size,), 0, tri_bank.shape[0])
    style = jnp.take(style_bank, idx_s, axis=0)
    tri = jnp.take(tri_bank, idx_g, axis=0)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        cons = NamedSharding(mesh, P("data"))
        style = jax.lax.with_sharding_constraint(style, cons)
        tri = jax.lax.with_sharding_constraint(tri, cons)
    style = style.astype(jnp.float32) / 127.5 - 1.0
    tri = tri.astype(jnp.float32) / 255.0
    return style, tri


def gen_crops(key: jax.Array, tri_hw: Tuple[int, int], resolution: int,
              stitching: bool, crop_margin: int = 10, min_overlap: int = 50):
    """On-device draw of the per-step crop rectangles (call INSIDE jit).

    crop1 is uniform over valid training-resolution positions -- the same
    distribution as the host loop's ``rng.integers(0, H - res + 1)``
    (loop._fetch_batch).  When ``stitching``, crop2 mirrors the algebra of
    ``engine.areas.gen_overlapping_square_crop`` (reference
    CropHelper.gen_overlapping_square_crop): uniform within ``radius`` of
    crop1, clamped to the image, guaranteeing ``min_overlap`` pixels of
    overlap after the ``crop_margin`` shrink.  Returns (crop1, crop2) as
    int32 [4] arrays (crop2 is None when not stitching).
    """
    h, w = int(tri_hw[0]), int(tri_hw[1])
    res = int(resolution)
    k1y, k1x, k2y, k2x = jax.random.split(key, 4)
    y1 = jax.random.randint(k1y, (), 0, max(h - res, 0) + 1)
    x1 = jax.random.randint(k1x, (), 0, max(w - res, 0) + 1)
    crop1 = jnp.stack([y1, x1, jnp.int32(res), jnp.int32(res)])
    if not stitching:
        return crop1, None
    # Static overlap radius (same degenerate-width guard as areas.py).
    mo = min(min_overlap, res - crop_margin - 1)
    radius = max(res - crop_margin - mo - 1, 0)

    def axis(k, c, limit):
        rmin = jnp.maximum(0, c - radius)
        rmax = jnp.maximum(rmin, jnp.minimum(c + radius, limit - res - 1))
        return jax.random.randint(k, (), rmin, rmax + 1)   # inclusive rmax

    crop2 = jnp.stack([axis(k2y, y1, h), axis(k2x, x1, w),
                       jnp.int32(res), jnp.int32(res)])
    return crop1, crop2


def crop_tri(tri: jax.Array, crop: jax.Array, resolution: int):
    """Batch-uniform training-resolution crop of the triband batch by traced
    (y, x) offsets; returns (geom_input, geom_truth) per the triband channel
    convention (G = conditioning, B = loss target; reference
    train.py:625-626)."""
    b = tri.shape[0]
    y, x = crop[0], crop[1]
    tile = jax.lax.dynamic_slice(
        tri, (jnp.int32(0), y, x, jnp.int32(0)),
        (b, resolution, resolution, tri.shape[3]))
    return tile[..., 1:2], tile[..., 2:3]
