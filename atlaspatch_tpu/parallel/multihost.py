"""Multi-host coordination.

The workload is embarrassingly parallel at slide granularity, so the
distribution model is: (1) static round-robin sharding of the slide list per
host — each host's OpenSlide-equivalent reads stay host-local and feed its own
chips, with no cross-host tensor traffic; (2) the reference's shared-FS
lock-file/idempotent-resume protocol (reference: atlas_patch/orchestration/
runner.py:154-181, SURVEY.md §2 row 52) kept as-is for elasticity, so extra or
restarted hosts self-shard safely. jax.distributed is initialized only when a
multi-host environment is configured.
"""

from __future__ import annotations

import logging
import os
from typing import Sequence, TypeVar

logger = logging.getLogger("atlaspatch_tpu.multihost")

T = TypeVar("T")

ENV_NUM_HOSTS = "ATLASPATCH_NUM_HOSTS"
ENV_HOST_ID = "ATLASPATCH_HOST_ID"


def maybe_init_distributed() -> None:
    """Initialize jax.distributed when a coordinator is configured via the
    standard JAX env vars (JAX_COORDINATOR_ADDRESS etc.). Safe no-op otherwise.

    Outside a cluster manager (SLURM/OMPI auto-detection), process identity
    comes from JAX_NUM_PROCESSES / JAX_PROCESS_ID so plain shell launches
    (and the two-process e2e tests) work with just four env vars.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return
    import jax

    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        jax.distributed.initialize(
            num_processes=int(num) if num is not None else None,
            process_id=int(pid) if pid is not None else None,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
    except Exception as e:  # noqa: BLE001
        logger.warning("jax.distributed.initialize failed: %s", e)


def host_identity() -> tuple[int, int]:
    """(host_id, num_hosts) from env overrides, a live jax.distributed setup,
    or (0, 1)."""
    num = os.environ.get(ENV_NUM_HOSTS)
    if num is not None:
        return int(os.environ.get(ENV_HOST_ID, "0")), max(1, int(num))
    try:
        import jax

        if jax.process_count() > 1:
            return jax.process_index(), jax.process_count()
    except Exception:  # noqa: BLE001
        pass
    return 0, 1


def host_shard(items: Sequence[T], *, steal: bool = False) -> list[T]:
    """This host's work list: its round-robin shard, then (with ``steal``)
    every other host's items appended after.

    With stealing a fast host drains its own shard and then races the
    stragglers' slides through the shared-FS lock + skip-existing protocol —
    the reference's N-jobs-race-on-locks elasticity with less lock contention
    on the common path. Callers must only enable it when skip-existing
    semantics are on, otherwise finished slides would be reprocessed.
    Disable explicitly with ATLASPATCH_HOST_STEAL=0.
    """
    host_id, num_hosts = host_identity()
    if num_hosts <= 1:
        return list(items)
    mine = [x for i, x in enumerate(items) if i % num_hosts == host_id]
    if steal and os.environ.get("ATLASPATCH_HOST_STEAL", "1") != "0":
        others = [x for i, x in enumerate(items) if i % num_hosts != host_id]
        logger.info(
            "Host %d/%d takes %d of %d slides (+%d stealable)",
            host_id, num_hosts, len(mine), len(items), len(others),
        )
        return mine + others
    logger.info("Host %d/%d takes %d of %d slides", host_id, num_hosts, len(mine), len(items))
    return mine
