"""Multi-host SPMD initialization and helpers.

The reference's multi-process stack (torch.distributed NCCL process groups,
file-store rendezvous, torch.multiprocessing.spawn -- reference
train.py:523-530, 811-816) collapses on TPU into
``jax.distributed.initialize()`` plus per-host input sharding: one process
per host, XLA collectives over ICI/DCN, no rendezvous files.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX if the environment calls for it.

    On Cloud TPU pods ``jax.distributed.initialize()`` autodetects everything;
    explicit args cover other clusters.  Returns True if multi-host was
    initialized, False for single-process runs.
    """
    env_says_multihost = any(os.environ.get(k) for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and num_processes is None and \
            not env_says_multihost and os.environ.get("TPU_WORKER_HOSTNAMES") is None:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        logger.info("jax.distributed initialized: process %d / %d, "
                    "%d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
        return True
    except Exception as e:  # pragma: no cover - environment dependent
        logger.warning(f"jax.distributed.initialize failed: {e}")
        return False


def host_shard_info():
    """(rank, num_ranks) for per-host input sharding (replaces the
    reference's rank-aware InfiniteSampler wiring)."""
    return jax.process_index(), jax.process_count()
