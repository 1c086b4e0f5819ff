"""Two-process DCN smoke test (SURVEY.md §2.4's TPU-native comms
replacement): jax.distributed.initialize over a local coordinator with
2 CPU processes x 2 virtual devices, one globally-sharded reduction
across both processes, plus per-host file sharding and call ownership
(parallel/distributed.py)."""

import socket
import subprocess
import sys
from pathlib import Path

_DRIVER = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_processor_tpu.parallel.distributed import (
    initialize_distributed, is_primary_host, local_file_shard, owns_call,
)

idx = initialize_distributed(f"localhost:{port}", num_processes=2,
                             process_id=pid)
assert idx == pid, (idx, pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()
assert is_primary_host() == (pid == 0)

# Globally-sharded array over the 2x2 (process x local-device) mesh;
# the replicated sum forces a cross-process collective over the
# coordinator-wired DCN layer.
mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ("data", "model"))
data = np.arange(16, dtype=np.float32).reshape(8, 2)
arr = jax.make_array_from_callback(
    (8, 2), NamedSharding(mesh, P("data", None)), lambda i: data[i])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == float(data.sum()), float(total)

files = local_file_shard([f"call_{i}.wav" for i in range(11)])
print("SHARD", pid, ",".join(files), flush=True)
owned = [i for i in range(50) if owns_call(f"id-{i}")]
print("OWNS", pid, ",".join(map(str, owned)), flush=True)
print("DCN-OK", pid, flush=True)
"""


def test_two_process_dcn_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = Path(__file__).resolve().parent.parent
    procs = [
        subprocess.Popen([sys.executable, "-c", _DRIVER, str(port),
                          str(pid)], cwd=repo, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0 and "DCN-OK" in out, f"rc={rc}\n{out}\n{err}"

    def parse(tag, out):
        for line in out.splitlines():
            if line.startswith(tag):
                parts = line.split(" ", 2)
                return set(parts[2].split(",")) if len(parts) > 2 \
                    and parts[2] else set()
        raise AssertionError(f"{tag} missing:\n{out}")

    shard0 = parse("SHARD", outs[0][1])
    shard1 = parse("SHARD", outs[1][1])
    assert shard0.isdisjoint(shard1)
    assert len(shard0 | shard1) == 11
    owns0 = parse("OWNS", outs[0][1])
    owns1 = parse("OWNS", outs[1][1])
    assert owns0.isdisjoint(owns1)
    assert len(owns0 | owns1) == 50
