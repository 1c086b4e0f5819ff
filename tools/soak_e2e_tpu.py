#!/usr/bin/env python
"""Large-sweep e2e soak on the real chip: N synthetic 3-minute calls
through the full config-5 pipeline in ONE sweep (12 x the bench's
8-file batches at N=96), asserting zero errors, full sentiment
engagement, complete CSV/DB rows, and reporting sustained
files/hour + RSS growth (the axon tunnel leaks ~1 B/B transferred —
CLAUDE.md — so RSS is reported, not asserted).

With ``message_path=1`` the soak additionally enables the VAD message
path (off by default, matching the reference's shipped config,
audio_processor.py:354-358) so the combined chunk+message pipeline —
VAD, windowed mono transcription, message rows, sentiment, CSV, DB —
is exercised end to end under sustained load, and asserts message
rows landed for every call.

Usage: python tools/soak_e2e_tpu.py [n_calls=96] [message_path=0]
"""

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
    n_calls = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    message_path = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    import tempfile

    import numpy as np

    import bench
    from audio_processor_tpu.host.db import DatabaseManager
    from audio_processor_tpu.pipeline.asr_engine import ASREngine
    from audio_processor_tpu.pipeline.engine import DataProcessor
    from audio_processor_tpu.pipeline.sentiment import SentimentAnalyzer
    from audio_processor_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    bench.NUM_CALLS = n_calls
    with tempfile.TemporaryDirectory() as td:
        work = Path(td)
        input_dir = work / "input"
        input_dir.mkdir()
        print(f"writing {n_calls} calls...", flush=True)
        bench.make_calls(input_dir)
        models = work / "models"
        client_dir, agent_dir = models / "client", models / "agent"
        client_dir.mkdir(parents=True)
        agent_dir.mkdir()
        bench.make_text_model(client_dir, bench.CLIENT_LABELS, 0)
        bench.make_text_model(agent_dir, bench.AGENT_LABELS, 1)
        bench.make_acoustic_models(models)

        from audio_processor_tpu.config import PipelineConfig

        cfg = PipelineConfig(
            transcription_model="", chunk_batch_size=16,
            file_batch_size=8, max_batch_size_mb=92.0,
            input_folder=str(input_dir),
            output_folder=str(work / "out"),
            db_path=str(work / "soak.sqlite"),
            logs_folder=str(work / "logs"), database_type="sqlite",
            client_text_model_path=str(client_dir),
            agent_text_model_path=str(agent_dir),
            client_acoustic_model_path=str(models / "svc_model.joblib"),
            client_acoustic_scaler_path=str(models / "svc_scaler.joblib"),
            agent_acoustic_model_path=str(models / "forest_model.joblib"),
            agent_acoustic_scaler_path=str(
                models / "forest_scaler.joblib"),
            save_csv_results=True,
            extras={"enable_message_path": message_path})
        print("loading engine + analyzer", flush=True)
        engine = ASREngine(cfg)
        analyzer = bench.EngagedSentimentAnalyzer(SentimentAnalyzer(cfg))

        # Warmup sweep over an 8-call subset: compiles the ASR + BERT
        # shapes and warms the tunnel so the timed soak measures
        # steady state, not cold-start.
        warm_in = work / "warm_input"
        warm_in.mkdir()
        for p in sorted(input_dir.glob("*.wav"))[:8]:
            (warm_in / p.name).write_bytes(p.read_bytes())
        wcfg = cfg.replace(input_folder=str(warm_in),
                           output_folder=str(work / "warm_out"),
                           db_path=str(work / "warm.sqlite"))
        wdb = DatabaseManager(wcfg)
        analyzer.set_database_manager(wdb)
        wproc = DataProcessor(wcfg, db_manager=wdb, asr_engine=engine,
                              sentiment_analyzer=analyzer)
        t0 = time.perf_counter()
        assert wproc.run() == 8
        wproc.close()
        wdb.close()
        print(f"warmup sweep {time.perf_counter()-t0:.0f}s", flush=True)

        db = DatabaseManager(cfg)
        analyzer.set_database_manager(db)
        analyzer.reset_counters()
        proc = DataProcessor(cfg, db_manager=db, asr_engine=engine,
                             sentiment_analyzer=analyzer)
        rss0 = rss_mb()
        t0 = time.perf_counter()
        n = proc.run()
        dt = time.perf_counter() - t0
        rss1 = rss_mb()

        assert n == n_calls, f"{n}/{n_calls} succeeded"
        assert proc.stats["errors"] == 0
        text_rate, fusion_rate = analyzer.engagement()
        assert text_rate >= 0.9 and fusion_rate >= 0.9
        csvs = list((work / "out").glob("optimized_results_*.csv"))
        assert len(csvs) == 1
        rows = csvs[0].read_text().count("\n") - 1
        assert rows == proc.stats["chunks_processed"], \
            (rows, proc.stats["chunks_processed"])
        n_db = db._execute("SELECT COUNT(*) AS c FROM chunk",
                           fetch="one")["c"]
        assert n_db == rows, (n_db, rows)
        n_msgs = 0
        if message_path:
            n_msgs = db._execute("SELECT COUNT(*) AS c FROM message",
                                 fetch="one")["c"]
            calls_with_msgs = db._execute(
                "SELECT COUNT(DISTINCT id_enregistrement) AS c "
                "FROM message", fetch="one")["c"]
            assert calls_with_msgs == n_calls, \
                (calls_with_msgs, n_calls)
        proc.close()
        db.close()

        audio_h = n_calls * bench.CALL_SEC / 3600.0
        print(f"\nSOAK OK: {n_calls} calls ({audio_h:.1f} audio-hours) "
              f"in {dt:.0f}s")
        print(f"  e2e RTFx {audio_h / (dt / 3600):.0f}, "
              f"files/hour {n_calls / (dt / 3600):.0f}")
        print(f"  chunks {proc.stats['chunks_processed']}, CSV rows "
              f"{rows}, DB rows {n_db}, engagement text "
              f"{text_rate:.2f} fusion {fusion_rate:.2f}")
        if message_path:
            print(f"  message path ON: {n_msgs} message rows across "
                  f"{n_calls} calls")
        print(f"  RSS {rss0:.0f} -> {rss1:.0f} MB "
              f"(+{rss1-rss0:.0f}; tunnel leaks ~1 B/B transferred)")


if __name__ == "__main__":
    main()
