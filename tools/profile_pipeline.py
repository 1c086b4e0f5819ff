#!/usr/bin/env python
"""Stage-level wall breakdown of the config-5 e2e sweep on the real
chip: decode, ASR (fused), text sentiment, acoustic classify, fusion +
aggregation + DB + CSV. Same synthetic workload as bench.py. Guides
where the next e2e RTFx comes from."""

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

T = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        T[name] = T.get(name, 0.0) + time.perf_counter() - t0
        return r
    return wrap


def main():
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod
    from audio_processor_tpu.host.db import DatabaseManager
    from audio_processor_tpu.pipeline.asr_engine import ASREngine
    from audio_processor_tpu.pipeline.engine import DataProcessor
    from audio_processor_tpu.pipeline.sentiment import SentimentAnalyzer
    from audio_processor_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    with tempfile.TemporaryDirectory() as td:
        work = Path(td)
        input_dir = work / "input"
        input_dir.mkdir()
        bench_mod.make_calls(input_dir)
        models = work / "models"
        client_dir, agent_dir = models / "client", models / "agent"
        client_dir.mkdir(parents=True)
        agent_dir.mkdir()
        bench_mod.make_text_model(client_dir, bench_mod.CLIENT_LABELS, 0)
        bench_mod.make_text_model(agent_dir, bench_mod.AGENT_LABELS, 1)
        bench_mod.make_acoustic_models(models)

        from audio_processor_tpu.config import PipelineConfig

        def make_cfg(**kw):
            return PipelineConfig(
                transcription_model="", chunk_batch_size=16,
                file_batch_size=8, logs_folder=str(work / "logs"),
                database_type="sqlite",
                client_text_model_path=str(client_dir),
                agent_text_model_path=str(agent_dir),
                client_acoustic_model_path=str(models / "svc_model.joblib"),
                client_acoustic_scaler_path=str(models / "svc_scaler.joblib"),
                agent_acoustic_model_path=str(models / "forest_model.joblib"),
                agent_acoustic_scaler_path=str(
                    models / "forest_scaler.joblib"),
                save_csv_results=True, **kw)

        cfg = make_cfg(input_folder=str(input_dir),
                       output_folder=str(work / "out0"),
                       db_path=str(work / "0.sqlite"))
        engine = ASREngine(cfg)
        analyzer = bench_mod.EngagedSentimentAnalyzer(
            SentimentAnalyzer(cfg))

        # Instrument stage boundaries. With async_device_fetch the
        # engine calls dispatch_chunks and realizes the fetch closure
        # on the analysis worker — time the two halves separately.
        real_dispatch = engine.dispatch_chunks

        def timed_dispatch(chunks):
            t0 = time.perf_counter()
            fetch = real_dispatch(chunks)
            T["asr_dispatch"] = T.get("asr_dispatch", 0.0) + \
                time.perf_counter() - t0
            return timed("asr_fetch", fetch)

        engine.dispatch_chunks = timed_dispatch
        from audio_processor_tpu.pipeline import asr_engine as ae_mod
        from audio_processor_tpu.models.tokenizer import batch_decode
        ae_mod.batch_decode = timed("ctc_text_decode", batch_decode)
        inner = analyzer._inner
        inner.text_analyzer.analyze_batch_sentiment = timed(
            "text_bert", inner.text_analyzer.analyze_batch_sentiment)
        inner.acoustic_analyzer.classify_features = timed(
            "acoustic_classify", inner.acoustic_analyzer.classify_features)
        inner._save_chunks_to_database = timed(
            "chunk_db", inner._save_chunks_to_database)
        inner._update_calls_aggregated_emotions = timed(
            "aggregation", inner._update_calls_aggregated_emotions)
        analyzer.analyze_batch_sentiment = timed(
            "sentiment_total", analyzer.analyze_batch_sentiment)

        for phase in ("warmup", "timed"):
            T.clear()
            out = work / f"out_{phase}"
            c = make_cfg(input_folder=str(input_dir),
                         output_folder=str(out),
                         db_path=str(work / f"{phase}.sqlite"))
            db = DatabaseManager(c)
            analyzer.set_database_manager(db)
            proc = DataProcessor(c, db_manager=db, asr_engine=engine,
                                 sentiment_analyzer=analyzer)
            proc._decode_batch = timed("decode", proc._decode_batch)
            t0 = time.perf_counter()
            n = proc.run()
            total = time.perf_counter() - t0
            db.close()
            assert n == bench_mod.NUM_CALLS
            if phase == "warmup":
                continue
            other = total - sum(
                v for k, v in T.items()
                if k in ("decode", "asr_dispatch", "asr_fetch",
                         "sentiment_total"))
            print(f"total sweep          : {total*1e3:7.0f} ms", flush=True)
            for k in ("decode", "asr_dispatch", "asr_fetch",
                      "ctc_text_decode", "sentiment_total", "text_bert",
                      "acoustic_classify", "chunk_db", "aggregation"):
                print(f"{k:21s}: {T.get(k, 0.0)*1e3:7.0f} ms", flush=True)
            print(f"{'scan+markers+csv+db':21s}: {other*1e3:7.0f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
