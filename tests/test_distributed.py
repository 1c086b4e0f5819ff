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


_ENGINE_DRIVER = r"""
import os, sys
port, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.host.db import DatabaseManager
from audio_processor_tpu.models import wav2vec2bert as w2v
from audio_processor_tpu.models.tokenizer import CTCVocab
from audio_processor_tpu.parallel.distributed import initialize_distributed
from audio_processor_tpu.pipeline.asr_engine import ASREngine
from audio_processor_tpu.pipeline.engine import DataProcessor

initialize_distributed(f"localhost:{port}", num_processes=2,
                       process_id=pid)
root = Path(root)
cfg = PipelineConfig(
    input_folder=str(root / "input"),
    output_folder=str(root / f"output_{pid}"),
    logs_folder=str(root / f"logs_{pid}"),
    database_type="sqlite", db_path=str(root / "shared.sqlite"),
    enable_mixed_precision=False,
    chunk_duration_sec=4.0, overlap_sec=1.0,
    length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
    file_batch_size=2,
)
vocab = CTCVocab.darija_default()
mcfg = w2v.W2VBertConfig(vocab_size=len(vocab), hidden_size=32,
                         num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=64,
                         conv_depthwise_kernel_size=7,
                         left_max_position_embeddings=8,
                         right_max_position_embeddings=2)
params = w2v.init_params(jax.random.PRNGKey(0), mcfg)
db = DatabaseManager(cfg)
proc = DataProcessor(cfg, db_manager=db,
                     asr_engine=ASREngine(cfg, params=params,
                                          model_cfg=mcfg, vocab=vocab))
proc.setup_models()
n = proc.run()
done = sorted(p.stem for p in
              (root / f"output_{pid}" / "processed_markers").glob("*.done"))
db.close()
print("DONE", pid, ",".join(done), flush=True)
print("N", pid, n, flush=True)
print("E2E-OK", pid, flush=True)
"""


def test_two_process_engine_e2e(tmp_path):
    """Full-pipeline multi-host run (roadmap #2 to the extent this
    infra allows): two coordinator-wired jax.distributed processes run
    the real DataProcessor over one shared input directory and one
    shared SQLite database; engine.run() shards calls by call-id hash
    (owns_call), so decode/device/persistence/markers are disjoint and
    their union covers every call exactly once."""
    import zlib

    import pytest

    from audio_processor_tpu.host.db import DatabaseManager
    from audio_processor_tpu.io import wav

    from tests.conftest import make_stereo_call

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    stems = [f"call-{i}" for i in range(8)]
    for s in stems:
        wav.write(input_dir / f"{s}.wav", make_stereo_call(dur=3.0), 16000)
    expected = {pid: {s for s in stems if zlib.crc32(s.encode()) % 2 == pid}
                for pid in range(2)}
    assert expected[0] and expected[1]  # both shards non-empty

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = Path(__file__).resolve().parent.parent
    procs = [
        subprocess.Popen([sys.executable, "-c", _ENGINE_DRIVER, str(port),
                          str(pid), str(tmp_path)], cwd=repo,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0 and "E2E-OK" in out, f"rc={rc}\n{out}\n{err[-4000:]}"

    # Each host processed exactly its hash shard, markers disjoint.
    for pid in range(2):
        done = None
        for line in outs[pid][1].splitlines():
            if line.startswith("DONE"):
                parts = line.split(" ", 2)
                done = set(parts[2].split(",")) if len(parts) > 2 \
                    and parts[2] else set()
        assert done == expected[pid], (done, expected[pid])

    # The shared database holds every call exactly once, with chunks.
    from audio_processor_tpu.config import PipelineConfig
    cfg = PipelineConfig(database_type="sqlite",
                         db_path=str(tmp_path / "shared.sqlite"),
                         output_folder=str(tmp_path))
    db = DatabaseManager(cfg)
    for s in stems:
        row = db.get_call_by_id_enregistrement(s)
        assert row is not None, s
        assert row["duration_seconds"] == pytest.approx(3.0, abs=0.01)
        assert len(db.get_chunks_by_id_enregistrement(s)) >= 1, s
    db.close()
