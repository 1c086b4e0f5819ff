"""Multi-device SPMD scale-out for the inference pipeline.

Replaces the reference's MultiGPUManager
(services/multi_gpu_manager.py:28-568): instead of one spawned process
per GPU with CUDA_VISIBLE_DEVICES isolation, per-worker model copies,
and filesystem-JSON result aggregation, a single process jits the same
fused device program over a ``jax.sharding.Mesh`` — the chunk batch
shards across the 'data' axis, parameters are replicated (optionally
tensor-parallel via parallel/mesh.py), and "aggregation" is just the
device->host fetch. Multi-host slices extend the same program via
``jax.distributed.initialize`` (DCN) with per-host input feeding.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_processor_tpu.parallel.mesh import make_mesh

logger = logging.getLogger(__name__)


def get_optimal_device_count(max_devices: Optional[int] = None) -> int:
    """Usable accelerator count (reference:
    multi_gpu_manager.py:571-579 picked min(gpus, max_gpus))."""
    import jax

    n = len([d for d in jax.devices() if d.platform != "cpu"]) \
        or len(jax.devices())
    return min(n, max_devices) if max_devices else n


def data_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    return {
        "buf3": NamedSharding(mesh, P("data", None, None)),   # [N,2,T]
        "rows2": NamedSharding(mesh, P("data", None)),        # [N,T]
        "vec": NamedSharding(mesh, P("data")),                # [N]
        "replicated": NamedSharding(mesh, P()),
    }


class MultiDeviceManager:
    """Distributes chunk batches across the mesh 'data' axis.

    Public surface mirrors the reference manager: ``num_workers`` and
    ``process_batches_parallel(batches, processor)`` — but batches run
    through one SPMD program instead of round-robin per-process queues
    (multi_gpu_manager.py:53-117).
    """

    def __init__(self, config, mesh: Optional[Mesh] = None):
        self.config = config
        if mesh is None:
            shape = config.get("mesh_shape") or {}
            data = int(shape.get("data", 0)) if shape else 0
            model = int(shape.get("model", 1)) if shape else 1
            seq = int(shape.get("seq", 1)) if shape else 1
            n = data * model * seq if data else None
            mesh = make_mesh(n_devices=n, data=data or None, model=model,
                             seq=seq)
        self.mesh = mesh
        self.num_workers = int(np.prod(mesh.devices.shape))
        logger.info("Multi-device mesh: %s",
                    dict(zip(mesh.axis_names, mesh.devices.shape)))

    @property
    def data_parallel_size(self) -> int:
        return self.mesh.devices.shape[0]

    def process_batches_parallel(self, file_batches: Sequence,
                                 processor) -> int:
        """Run file batches through the processor under the mesh.

        The processor's ASR engine must have been constructed with this
        manager's mesh (engine shards its device batches over 'data').
        """
        total = 0
        with self.mesh:
            for i, batch in enumerate(file_batches):
                total += processor.process_file_batch(i, batch)
        return total
