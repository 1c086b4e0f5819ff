#!/usr/bin/env python
"""Interleaved A/B of engine variants on the real chip.

The tunnel transport drifts 2x across minutes, so cross-process bench
comparisons are phase-lucky. This runs full config-5 e2e sweeps in ONE
process, alternating variants A/B/A/B..., and reports per-variant
stats — drift hits both arms equally.

Usage: python tools/ab_async.py [reps=4] [key=value ...]
  where key=value pairs are applied to variant B's config (variant A
  is the defaults). Default B: async_device_fetch=false.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    reps = 4
    overrides = {}
    for arg in sys.argv[1:]:
        if "=" in arg:
            k, v = arg.split("=", 1)
            overrides[k] = {"true": True, "false": False}.get(
                v.lower(), None)
            if overrides[k] is None:
                try:
                    overrides[k] = int(v)
                except ValueError:
                    try:
                        overrides[k] = float(v)
                    except ValueError:
                        overrides[k] = v   # string-valued config key
        else:
            reps = int(arg)
    if not overrides:
        overrides = {"async_device_fetch": False}
    print(f"A = defaults, B = {overrides}, {reps} reps each",
          flush=True)

    import bench
    from audio_processor_tpu.host.db import DatabaseManager
    from audio_processor_tpu.pipeline.asr_engine import ASREngine
    from audio_processor_tpu.pipeline.engine import DataProcessor
    from audio_processor_tpu.pipeline.sentiment import SentimentAnalyzer
    from audio_processor_tpu.utils.system import enable_compilation_cache
    import tempfile

    enable_compilation_cache()
    with tempfile.TemporaryDirectory() as td:
        work = Path(td)
        input_dir = work / "input"
        input_dir.mkdir()
        bench.make_calls(input_dir)
        models = work / "models"
        client_dir, agent_dir = models / "client", models / "agent"
        client_dir.mkdir(parents=True)
        agent_dir.mkdir()
        bench.make_text_model(client_dir, bench.CLIENT_LABELS, 0)
        bench.make_text_model(agent_dir, bench.AGENT_LABELS, 1)
        bench.make_acoustic_models(models)

        def make_cfg(tag, **kw):
            from audio_processor_tpu.config import PipelineConfig

            # Defaults the B-arm overrides may replace — setdefault,
            # not positional, or `chunk_batch_size=32` collides with
            # the hardcoded default (TypeError: multiple values).
            kw.setdefault("transcription_model", "")
            kw.setdefault("chunk_batch_size", 16)
            kw.setdefault("file_batch_size", 8)
            return PipelineConfig(
                input_folder=str(input_dir),
                output_folder=str(work / f"out_{tag}"),
                db_path=str(work / f"{tag}.sqlite"),
                logs_folder=str(work / "logs"),
                database_type="sqlite",
                client_text_model_path=str(client_dir),
                agent_text_model_path=str(agent_dir),
                client_acoustic_model_path=str(models / "svc_model.joblib"),
                client_acoustic_scaler_path=str(
                    models / "svc_scaler.joblib"),
                agent_acoustic_model_path=str(
                    models / "forest_model.joblib"),
                agent_acoustic_scaler_path=str(
                    models / "forest_scaler.joblib"),
                save_csv_results=True, **kw)

        print("loading engine + analyzer", flush=True)
        engine = ASREngine(make_cfg("boot"))
        # Keys consumed at ASREngine CONSTRUCTION (device program
        # geometry) are invisible to a per-sweep config override on a
        # shared engine — build a second engine for arm B so e.g.
        # chunk_batch_size=32 actually changes the compiled programs.
        # every key ASREngine.__init__ consumes (asr_engine.py:73-160)
        ENGINE_KEYS = ("chunk_batch_size", "length_buckets_sec",
                       "enable_mixed_precision", "quantization",
                       "target_sample_rate", "chunk_duration_sec",
                       "int16_transfers", "fuse_acoustic_features",
                       "emit_word_timestamps", "beam_width",
                       "beam_word_bonus", "attention_impl",
                       "transcription_model")
        eng_overrides = {k: v for k, v in overrides.items()
                         if k in ENGINE_KEYS}
        engine_b = engine
        if eng_overrides:
            print(f"building arm-B engine ({eng_overrides})",
                  flush=True)
            engine_b = ASREngine(make_cfg("bootB", **eng_overrides),
                                 params=engine.params,
                                 model_cfg=engine.model_cfg,
                                 vocab=engine.vocab)
        analyzer = bench.EngagedSentimentAnalyzer(
            SentimentAnalyzer(make_cfg("boot2")))

        def sweep(tag, eng=engine, **kw):
            cfg = make_cfg(tag, **kw)
            db = DatabaseManager(cfg)
            analyzer.set_database_manager(db)
            proc = DataProcessor(cfg, db_manager=db, asr_engine=eng,
                                 sentiment_analyzer=analyzer)
            analyzer.reset_counters()
            t0 = time.perf_counter()
            n = proc.run()
            dt = time.perf_counter() - t0
            proc.close()
            db.close()
            assert n == bench.NUM_CALLS and proc.stats["errors"] == 0
            return dt

        print("warmup sweeps (one per arm)", flush=True)
        print(f"  warm A {sweep('warmA'):.1f}s", flush=True)
        print(f"  warm B {sweep('warmB', eng=engine_b, **overrides):.1f}s",
              flush=True)

        times = {"A": [], "B": []}
        for r in range(reps):
            for arm, eng, kw in (("A", engine, {}),
                                 ("B", engine_b, overrides)):
                dt = sweep(f"{arm}{r}", eng=eng, **kw)
                times[arm].append(dt)
                print(f"  rep{r} {arm}: {dt:.1f}s", flush=True)

        audio_h = bench.NUM_CALLS * bench.CALL_SEC / 3600.0
        for arm in ("A", "B"):
            ts = np.asarray(times[arm])
            print(f"{arm}: best {ts.min():.1f}s p50 "
                  f"{np.percentile(ts, 50):.1f}s -> best RTFx "
                  f"{audio_h / (ts.min() / 3600):.0f}, p50 RTFx "
                  f"{audio_h / (np.percentile(ts, 50) / 3600):.0f}")


if __name__ == "__main__":
    main()
