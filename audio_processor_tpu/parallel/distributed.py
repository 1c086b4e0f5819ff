"""Multi-host (DCN) bootstrap.

Within a slice, parallelism is ICI collectives under one process
(parallel/mesh.py). Across hosts, JAX's standard multi-controller
model applies: every host runs the same program,
``jax.distributed.initialize`` wires the DCN layer, and each host
feeds only its local shard of the batch (SURVEY.md §2.4's TPU-native
replacement for the reference's nonexistent comms backend).

Host-side stages that must run exactly once per run (DB writes, topic
calls, report files) are gated on process_index == 0; alternatively
calls can be sharded across hosts by call-id hash (``owns_call``).
"""

from __future__ import annotations

import logging
import os
import zlib
from typing import Optional

logger = logging.getLogger(__name__)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    TPU pod metadata when none are set). Returns process_index.

    Safe to call on a single host: without any coordinator info this
    is a no-op returning 0.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        logger.info("Single-host run (no coordinator configured)")
        return 0
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    logger.info("jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count())
    return jax.process_index()


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0


def owns_call(call_id: str) -> bool:
    """Deterministic call-id -> host assignment for sharding host-side
    work (DB writes, Bedrock calls) across processes."""
    import jax

    n = jax.process_count()
    if n <= 1:
        return True
    return zlib.crc32(call_id.encode()) % n == jax.process_index()


def local_file_shard(files, sort: bool = True):
    """Partition the input file list so each host decodes only its
    share (per-host data loading with a globally-sharded batch)."""
    import jax

    files = sorted(files) if sort else list(files)
    n, i = jax.process_count(), jax.process_index()
    return files[i::n]
