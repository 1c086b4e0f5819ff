#!/usr/bin/env python
"""RSS soak for the streaming-CSV engine path (CPU backend).

Round-2 VERDICT flagged `_all_results` accumulation: a 24 h --watch
run at full throughput would hold ~1M chunk rows in RAM. Round 3
streams CSV rows per batch; this soak proves RSS stays flat across
many sweeps WITH CSV enabled. It runs on the CPU backend because the
axon tunnel client leaks host RSS on every H2D transfer (~1 B/B,
CLAUDE.md) — framework state, which is what this measures, is
transport-independent.

With ``message_path=1`` each sweep also runs the VAD message path
into a SQLite DB (sentiment-less combined pipeline) — the CPU-backend
race/RSS shakeout for engine._run_message_path's multi-channel
dispatch.

Usage: python tools/soak_csv_rss.py [sweeps=30] [files=12]
                                    [message_path=0]
"""

import gc
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    message_path = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False

    import tempfile

    import numpy as np

    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.io import wav
    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.models.tokenizer import CTCVocab
    from audio_processor_tpu.pipeline.asr_engine import ASREngine
    from audio_processor_tpu.pipeline.engine import DataProcessor

    with tempfile.TemporaryDirectory() as td:
        work = Path(td)
        input_dir = work / "in"
        input_dir.mkdir()
        rng = np.random.default_rng(0)
        t = np.arange(16000 * 8) / 16000
        for i in range(n_files):
            x = np.stack([0.2 * np.sin(2 * np.pi * (200 + i) * t),
                          0.2 * np.sin(2 * np.pi * (300 + i) * t)])
            wav.write(input_dir / f"c{i}.wav",
                      x + 0.02 * rng.standard_normal(x.shape), 16000)

        cfg = PipelineConfig(
            input_folder=str(input_dir),
            output_folder=str(work / "out"),
            logs_folder=str(work / "logs"),
            chunk_duration_sec=4.0, overlap_sec=1.0,
            length_buckets_sec=(4.0,), chunk_batch_size=8,
            file_batch_size=4, save_csv_results=True,
            enable_mixed_precision=False,
            database_type="sqlite", db_path=str(work / "soak.sqlite"),
            extras={"enable_message_path": message_path})
        vocab = CTCVocab.darija_default()
        mcfg = w2v.W2VBertConfig(
            vocab_size=len(vocab), hidden_size=64, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
            conv_depthwise_kernel_size=7,
            left_max_position_embeddings=8,
            right_max_position_embeddings=2)
        params = w2v.init_params(jax.random.PRNGKey(0), mcfg)
        engine = ASREngine(cfg, params=params, model_cfg=mcfg,
                           vocab=vocab)
        db = None
        if message_path:
            from audio_processor_tpu.host.db import DatabaseManager

            db = DatabaseManager(cfg)
        proc = DataProcessor(cfg, db_manager=db, asr_engine=engine)
        proc.setup_models()

        samples = []
        t0 = time.perf_counter()
        for s in range(sweeps):
            # fresh markers each sweep so files re-process (watch-mode
            # stand-in with constant new work)
            import shutil

            shutil.rmtree(proc.markers.dir, ignore_errors=True)
            n = proc.run()
            assert n == n_files, f"sweep {s}: {n}/{n_files}"
            if message_path:
                # message upserts are idempotent per (call, order) —
                # re-sweeps REPLACE rows, so the count stays at one
                # full set covering every call
                n_calls = db._execute(
                    "SELECT COUNT(DISTINCT id_enregistrement) AS c "
                    "FROM message", fetch="one")["c"]
                assert n_calls == n_files, \
                    f"sweep {s}: messages for {n_calls}/{n_files} calls"
            gc.collect()
            samples.append(rss_mb())
            if s % 5 == 0 or s == sweeps - 1:
                print(f"sweep {s:3d}: rss {samples[-1]:8.1f} MB",
                      flush=True)
        proc.close()
        if db is not None:
            db.close()
        dur = time.perf_counter() - t0
        head = sum(samples[2:5]) / 3       # post-warmup baseline
        tail = sum(samples[-3:]) / 3
        growth = tail - head
        csvs = list((work / "out").glob("optimized_results_*.csv"))
        print(f"\n{sweeps} sweeps x {n_files} files in {dur:.0f}s; "
              f"{len(csvs)} CSVs written")
        print(f"RSS: post-warmup {head:.1f} MB -> final {tail:.1f} MB "
              f"(growth {growth:+.1f} MB)")
        assert growth < 40.0, "RSS grew — CSV path is accumulating"
        print("SOAK OK: RSS flat with CSV streaming enabled")


if __name__ == "__main__":
    main()
