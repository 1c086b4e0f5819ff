"""End-to-end pipeline tests: scan -> decode -> chunk -> ASR ->
sentiment(fallback) -> DB/CSV/markers/artifacts, plus CLI flows."""

import json

import numpy as np
import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.host.db import DatabaseManager
from audio_processor_tpu.io import wav
from audio_processor_tpu.pipeline.engine import DataProcessor

from tests.conftest import make_stereo_call


def tiny_engine(cfg):
    import jax

    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.models.tokenizer import CTCVocab
    from audio_processor_tpu.pipeline.asr_engine import ASREngine

    vocab = CTCVocab.darija_default()
    mcfg = w2v.W2VBertConfig(vocab_size=len(vocab), hidden_size=32,
                             num_hidden_layers=1, num_attention_heads=2,
                             intermediate_size=64,
                             conv_depthwise_kernel_size=7,
                             left_max_position_embeddings=8,
                             right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), mcfg)
    return ASREngine(cfg, params=params, model_cfg=mcfg, vocab=vocab)


@pytest.fixture
def workspace(tmp_path):
    input_dir = tmp_path / "input"
    output_dir = tmp_path / "output"
    input_dir.mkdir()
    for i in range(3):
        wav.write(input_dir / f"call-{i}.wav",
                  make_stereo_call(dur=4.0 + i), 16000)
    # a mono file that must be rejected at scan
    wav.write(input_dir / "mono.wav", np.zeros(16000, np.float32), 16000)
    # sidecar metadata for call-0
    (input_dir / "call-0.json").write_text(json.dumps({
        "AGENT_ID": "a1", "CALL_ID": "k1",
        "DESTINATION_NUMBER": "0529000220",
        "DATE_": "01/02/2026 10:00:00", "QUEUE_NAME": "q"}))
    cfg = PipelineConfig(
        input_folder=str(input_dir), output_folder=str(output_dir),
        logs_folder=str(tmp_path / "logs"),
        database_type="sqlite", db_path=str(tmp_path / "db.sqlite"),
        enable_mixed_precision=False,
        chunk_duration_sec=4.0, overlap_sec=1.0,
        length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
        save_csv_results=True, save_intermediate_results=True,
        save_sentiment_analysis=True,
        file_batch_size=2,
    )
    return cfg, input_dir, output_dir


def test_full_pipeline_run(workspace):
    cfg, input_dir, output_dir = workspace
    db = DatabaseManager(cfg)
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    n = proc.run()
    assert n == 3  # mono rejected, 3 stereo succeeded

    # DB rows: calls with duration + aggregated sentiment fields set.
    for i in range(3):
        row = db.get_call_by_id_enregistrement(f"call-{i}")
        assert row is not None
        assert row["duration_seconds"] == pytest.approx(4.0 + i, abs=0.01)
        chunks = db.get_chunks_by_id_enregistrement(f"call-{i}")
        assert len(chunks) >= 1
        assert all(isinstance(c["transcription_chunk"], str)
                   for c in chunks)
        # sentiment models unconfigured -> empty labels but call-level
        # aggregation still runs ("Inconnu").
        assert row["emotion_client_globale"] == "Inconnu"
        assert row["ton_agent_global"] == "Inconnu"

    # Markers.
    assert proc.markers.is_processed(input_dir / "call-0.wav")

    # Artifacts.
    assert list(output_dir.glob("run_summary_*.json"))
    assert list(output_dir.glob("failed_calls_*.json"))
    assert list(output_dir.glob("file_statuses_*.json"))
    assert list((output_dir / "intermediate").glob("batch_*.jsonl"))
    csvs = list(output_dir.glob("optimized_results_*.csv"))
    assert csvs
    header = csvs[0].read_text().splitlines()[0]
    assert "client_fusion_confidence" in header
    assert "transcription_chunk" in header

    # Idempotent re-run: everything skipped.
    proc2 = DataProcessor(cfg, db_manager=db,
                          asr_engine=proc.asr_engine)
    proc2.setup_models()
    n2 = proc2.run()
    assert n2 == 0
    assert proc2.stats["files_skipped"] == 3
    db.close()


def test_message_path_writes_messages(workspace):
    cfg, input_dir, output_dir = workspace
    cfg = cfg.replace(extras={**cfg.extras, "enable_message_path": True})
    db = DatabaseManager(cfg.replace(db_path=str(output_dir / "m.sqlite")))
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    proc.run()
    msgs = db.get_messages_by_id_enregistrement("call-0")
    assert len(msgs) >= 1
    assert {m["speaker"] for m in msgs} <= {"agent", "client"}
    orders = [m["order_message"] for m in msgs]
    assert orders == sorted(orders)

    # Reprocessing refreshes the call's messages idempotently (no
    # UNIQUE-constraint leftovers, no duplicates): same rows after a
    # second run with cleared markers.
    import shutil

    shutil.rmtree(proc.markers.dir, ignore_errors=True)
    proc2 = DataProcessor(cfg, db_manager=db,
                          asr_engine=proc.asr_engine)
    proc2.setup_models()
    proc2.run()
    msgs2 = db.get_messages_by_id_enregistrement("call-0")
    assert [(m["order_message"], m["text"], m["speaker"])
            for m in msgs2] == \
        [(m["order_message"], m["text"], m["speaker"]) for m in msgs]
    db.close()


def test_failed_file_markers(workspace, monkeypatch):
    """A file that passes scan but fails decode gets a .failed marker,
    a failed_calls entry, and doesn't block the rest of the batch."""
    cfg, input_dir, output_dir = workspace
    bad = input_dir / "corrupt.wav"
    wav.write(bad, make_stereo_call(dur=2.0), 16000)

    import audio_processor_tpu.pipeline.engine as engine_mod

    real_load = engine_mod.load_audio

    def flaky_load(path):
        if Path(path).name == "corrupt.wav":
            raise RuntimeError("simulated decode failure")
        return real_load(path)

    from pathlib import Path

    monkeypatch.setattr(engine_mod, "load_audio", flaky_load)
    # Disable the native batch preload so the failure injection in
    # load_audio is actually reached for corrupt.wav.
    from audio_processor_tpu.io import native as native_mod

    monkeypatch.setattr(native_mod, "available", lambda: False)
    db = DatabaseManager(cfg.replace(db_path=str(output_dir / "f.db")))
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    proc.run()
    assert proc.stats["files_failed"] == 1
    assert proc.stats["files_success"] == 3
    assert (proc.markers.dir / "corrupt.failed").exists()
    assert any(f["filename"] == "corrupt.wav" for f in proc.failed_files)
    statuses = {Path(s["file"]).name: s["status"]
                for s in proc._file_statuses}
    assert statuses["corrupt.wav"] == "failed"
    db.close()


def test_cli_dry_run(workspace, capsys):
    cfg, input_dir, output_dir = workspace
    import yaml

    from audio_processor_tpu.cli import main

    cfg_path = input_dir.parent / "cfg.yaml"
    d = {"input_folder": str(input_dir), "output_folder": str(output_dir),
         "logs_folder": str(input_dir.parent / "logs")}
    cfg_path.write_text(yaml.safe_dump(d))
    rc = main(["--config", str(cfg_path), "--dry-run"])
    assert rc == 0


def test_cli_rejects_bad_config(tmp_path):
    import yaml

    from audio_processor_tpu.cli import main

    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump({"input_folder": "", "logs_folder":
                                 str(tmp_path / "logs")}))
    rc = main(["--config", str(p), "--dry-run"])
    assert rc == 2


def test_batching_rules(tmp_path):
    from audio_processor_tpu.pipeline.batching import create_file_batches

    files = []
    for i, kb in enumerate([900, 800, 700, 100, 50]):
        p = tmp_path / f"f{i}.wav"
        p.write_bytes(b"0" * kb * 1024)
        files.append(p)
    batches = create_file_batches(files, max_batch_size_mb=1.5,
                                  max_files_per_batch=10)
    # largest-first packing under 1.5MB
    sizes = [[f.stat().st_size // 1024 for f in b] for b in batches]
    assert sizes[0][0] == 900
    for b in batches:
        assert sum(f.stat().st_size for f in b) <= 1.6 * 1024 * 1024
    assert sum(len(b) for b in batches) == 5


def test_tuning_advice_in_summary_when_enabled(workspace):
    """enable_auto_batch_size consults the advisory tuners at sweep
    end and surfaces them in the run summary — advisory only, never
    auto-applied (static TPU shapes; see engine._consult_tuners)."""
    from dataclasses import replace

    from audio_processor_tpu.obs.monitor import PerformanceMonitor

    cfg, input_dir, output_dir = workspace
    cfg = replace(cfg, enable_auto_batch_size=True)
    mon = PerformanceMonitor(cfg)
    proc = DataProcessor(cfg, asr_engine=tiny_engine(cfg), monitor=mon)
    proc.setup_models()
    proc.run()
    summary = json.loads(
        sorted(output_dir.glob("run_summary_*.json"))[-1].read_text())
    advice = summary["tuning_advice"]
    assert advice["file_batch_size"]["current"] == cfg.file_batch_size
    assert advice["file_batch_size"]["recommended"] >= 1
    assert advice["io_workers"]["recommended"] >= 1
    # config knob stays untouched — advisory only
    assert cfg.file_batch_size == 2

    # Disabled (default): summary records null, tuners not consulted.
    cfg2 = replace(cfg, enable_auto_batch_size=False,
                   output_folder=str(output_dir / "o2"))
    proc2 = DataProcessor(cfg2, asr_engine=proc.asr_engine)
    proc2.setup_models()
    proc2.run()
    out2 = output_dir / "o2"
    summary2 = json.loads(
        sorted(out2.glob("run_summary_*.json"))[-1].read_text())
    assert summary2["tuning_advice"] is None


def test_run_summary_latency_percentiles(workspace):
    import json

    cfg, input_dir, output_dir = workspace
    proc = DataProcessor(cfg, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    proc.run()
    summary = json.loads(
        sorted(output_dir.glob("run_summary_*.json"))[-1].read_text())
    assert summary["p50_call_latency_seconds"] > 0
    assert summary["p95_call_latency_seconds"] >= \
        summary["p50_call_latency_seconds"]
    # Latency is per FILE (decode start -> analysis done), not one
    # shared batch-residency value: 3 files over 2 batches must yield
    # 3 samples that are not all identical (files prefetched while an
    # earlier batch occupies the device accrue queueing time).
    assert len(proc._file_latencies) == 3
    assert len({round(x, 9) for x in proc._file_latencies}) > 1


class _FakeOkEngine:
    """Minimal ASR engine stand-in: returns one ok row per chunk."""

    def transcribe_chunks(self, chunks):
        return [{"file_name": c.file_name, "chunk_idx": c.chunk_idx,
                 "start_time": 0.0, "end_time": 1.0,
                 "transcription_chunk": "x", "agent_transcription": "x",
                 "client_transcription": "x", "error": ""}
                for c in chunks]


class _HangingEngine(_FakeOkEngine):
    def __init__(self, seconds):
        self.seconds = seconds

    def transcribe_chunks(self, chunks):
        import time

        time.sleep(self.seconds)
        return super().transcribe_chunks(chunks)


def _error_workspace(tmp_path, n_files, **cfg_kw):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    for i in range(n_files):
        wav.write(input_dir / f"c{i}.wav", make_stereo_call(dur=2.0), 16000)
    cfg = PipelineConfig(
        input_folder=str(input_dir), output_folder=str(tmp_path / "out"),
        chunk_duration_sec=2.0, overlap_sec=0.5,
        length_buckets_sec=(2.0,), chunk_batch_size=4,
        file_batch_size=1, **cfg_kw)
    return cfg, input_dir


def test_hung_device_batch_counts_timeout_and_trips_gate(tmp_path):
    """A device dispatch that exceeds timeout_seconds counts as an
    error and the sweep aborts at max_errors, matching the reference's
    bounded batch futures (pipeline.py:409-427)."""
    cfg, input_dir = _error_workspace(tmp_path, 4, timeout_seconds=1,
                                      max_errors=2)
    proc = DataProcessor(cfg, asr_engine=_HangingEngine(seconds=3.0))
    files = proc.file_scanner.scan_files_parallel(input_dir)
    ok = proc.process_files_parallel(files)
    assert proc.stats["errors"] >= 2
    assert ok == 0  # every attempted batch timed out
    # gate tripped before all 4 batches were attempted
    assert proc.stats["files_processed"] < 4


def test_per_file_decode_failures_trip_gate(tmp_path, monkeypatch):
    """Per-file decode failures count toward the abort-after-N gate
    (reference counts per-task errors, pipeline.py:409-427)."""
    import audio_processor_tpu.pipeline.engine as engine_mod
    from audio_processor_tpu.io import native as native_mod

    def broken_load(path):
        raise RuntimeError("boom")

    monkeypatch.setattr(engine_mod, "load_audio", broken_load)
    monkeypatch.setattr(native_mod, "available", lambda: False)
    cfg, input_dir = _error_workspace(tmp_path, 6, max_errors=3,
                                      max_retries=1)
    proc = DataProcessor(cfg, asr_engine=_FakeOkEngine())
    files = proc.file_scanner.scan_files_parallel(input_dir)
    ok = proc.process_files_parallel(files)
    assert ok == 0
    assert proc.stats["errors"] == 3
    # aborted after 3 of 6 single-file batches
    assert proc.stats["files_failed"] == 3
    assert proc.stats["files_processed"] == 3


def test_error_budget_is_per_sweep(tmp_path, monkeypatch):
    """In --watch mode, errors from an earlier sweep must not make
    later sweeps abort immediately (advisor finding r1)."""
    cfg, input_dir = _error_workspace(tmp_path, 3, max_errors=3,
                                      max_retries=1)
    proc = DataProcessor(cfg, asr_engine=_FakeOkEngine())
    # Simulate an earlier sweep that burned the lifetime budget.
    proc.stats["errors"] = 50
    files = proc.file_scanner.scan_files_parallel(input_dir)
    ok = proc.process_files_parallel(files)
    assert ok == 3  # fresh sweep processes everything
    assert proc.stats["files_success"] == 3


def test_timed_out_batch_files_not_reprocessed_by_next_sweep(tmp_path):
    """A batch abandoned on a timed-out worker keeps its files out of
    the next sweep (no concurrent duplicate processing); once the
    worker finishes, the markers make later sweeps skip them too."""
    import time

    cfg, input_dir = _error_workspace(tmp_path, 2, timeout_seconds=1,
                                      max_errors=10)
    # hang far longer than the sweep so the worker is provably still
    # running when the sweep returns (1 s timeout x 2 batches ~ 2 s)
    proc = DataProcessor(cfg, asr_engine=_HangingEngine(seconds=6.0))
    files = proc.file_scanner.scan_files_parallel(input_dir)
    ok = proc.process_files_parallel(files)
    assert ok == 0 and proc.stats["errors"] >= 1
    # the abandoned worker is still running: a new sweep must skip
    # everything (in-flight), not double-process
    with proc._in_flight_lock:
        assert len(proc._in_flight) > 0
    ok2 = proc.process_files_parallel(files)
    assert ok2 == 0
    # poll until the abandoned workers finish and release their files
    deadline = time.time() + 30
    while time.time() < deadline:
        with proc._in_flight_lock:
            if not proc._in_flight:
                break
        time.sleep(0.25)
    with proc._in_flight_lock:
        assert not proc._in_flight


def test_corrupt_ogg_marked_failed_without_blocking_batch(workspace):
    """A syntactically-broken .ogg passes the scanner's cheap probe or
    fails decode later; either way it must end as a failed marker, not
    an engine crash (reference retry/skip semantics)."""
    cfg, input_dir, output_dir = workspace
    bad = input_dir / "broken.ogg"
    # valid OggS magic + garbage: survives extension checks, fails decode
    bad.write_bytes(b"OggS" + bytes(range(256)) * 8)
    db = DatabaseManager(cfg.replace(db_path=str(output_dir / "o.db")))
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    proc.run()
    assert proc.stats["files_success"] == 3
    # the broken ogg either failed scan (not counted) or failed decode
    # (failed marker) — it must never appear as success
    from pathlib import Path

    statuses = {Path(s["file"]).name: s["status"]
                for s in proc._file_statuses}
    assert statuses.get("broken.ogg") != "success"
    db.close()


def test_async_fetch_overlaps_dispatch_with_result_handling(tmp_path):
    """With an engine exposing dispatch_chunks, batch N+1's device
    dispatch happens while batch N's results are still being fetched
    on the analysis worker (the chip never idles behind host-side
    result handling)."""
    import threading
    import time

    events = {}
    lock = threading.Lock()

    class _AsyncEngine(_FakeOkEngine):
        def __init__(self):
            self.calls = 0

        def dispatch_chunks(self, chunks):
            self.calls += 1
            n = self.calls
            with lock:
                events[f"dispatch_{n}"] = time.perf_counter()

            def fetch():
                time.sleep(0.4)      # device still computing / D2H
                with lock:
                    events[f"fetch_{n}_end"] = time.perf_counter()
                return super(_AsyncEngine, self).transcribe_chunks(
                    chunks)
            return fetch

    cfg, input_dir = _error_workspace(tmp_path, 3)
    proc = DataProcessor(cfg, asr_engine=_AsyncEngine())
    files = proc.file_scanner.scan_files_parallel(input_dir)
    ok = proc.process_files_parallel(files)
    assert ok == 3 and proc.stats["errors"] == 0
    assert proc.stats["chunks_processed"] > 0
    # Batch 2 (and 3) dispatched before batch 1's fetch completed.
    assert events["dispatch_2"] < events["fetch_1_end"]
    assert events["dispatch_3"] < events["fetch_1_end"]
    # Fetches realized in batch order on the analysis worker.
    assert events["fetch_1_end"] < events["fetch_2_end"] \
        < events["fetch_3_end"]
    proc.close()


def test_async_fetch_window_is_bounded(tmp_path):
    """No more than max_inflight_batches are dispatched beyond the
    analysis stage (decoded waveforms would otherwise accumulate
    without limit when analysis lags dispatch)."""
    import threading
    import time

    lock = threading.Lock()
    state = {"inflight": 0, "max_inflight": 0}

    class _SlowFetchEngine(_FakeOkEngine):
        def dispatch_chunks(self, chunks):
            with lock:
                state["inflight"] += 1
                state["max_inflight"] = max(state["max_inflight"],
                                            state["inflight"])

            def fetch():
                time.sleep(0.3)
                with lock:
                    state["inflight"] -= 1
                return super(_SlowFetchEngine, self).transcribe_chunks(
                    chunks)
            return fetch

    cfg, input_dir = _error_workspace(tmp_path, 6,
                                      max_inflight_batches=2)
    proc = DataProcessor(cfg, asr_engine=_SlowFetchEngine())
    files = proc.file_scanner.scan_files_parallel(input_dir)
    ok = proc.process_files_parallel(files)
    assert ok == 6 and proc.stats["errors"] == 0
    # window bound: 2 pending + the one being dispatched
    assert state["max_inflight"] <= 3
    proc.close()


def test_slow_db_insert_does_not_stall_device_dispatch(tmp_path):
    """Call-row DB writes run in the analysis stage, not on the device
    worker: a database insert that blocks must not delay the next
    batch's device dispatch (VERDICT r2 weak #5)."""
    import threading
    import time

    events = {}
    lock = threading.Lock()

    class _RecordingEngine(_FakeOkEngine):
        def __init__(self):
            self.calls = 0

        def transcribe_chunks(self, chunks):
            self.calls += 1
            with lock:
                events[f"asr_{self.calls}_start"] = time.perf_counter()
            time.sleep(0.05)
            return super().transcribe_chunks(chunks)

    class _SlowDB:
        def __init__(self):
            self.inserts = 0

        def insert_call(self, row):
            self.inserts += 1
            n = self.inserts
            time.sleep(1.5)           # a reconnecting/slow database
            with lock:
                events[f"insert_{n}_end"] = time.perf_counter()

    cfg, input_dir = _error_workspace(tmp_path, 3)
    db = _SlowDB()
    proc = DataProcessor(cfg, db_manager=db,
                         asr_engine=_RecordingEngine())
    files = proc.file_scanner.scan_files_parallel(input_dir)
    ok = proc.process_files_parallel(files)
    assert ok == 3 and proc.stats["errors"] == 0
    assert db.inserts == 3
    # Batch 2's (and 3's) device dispatch started before batch 1's
    # blocking insert finished.
    assert events["asr_2_start"] < events["insert_1_end"]
    assert events["asr_3_start"] < events["insert_1_end"]
    proc.close()


def test_csv_streams_per_batch_and_matches_bulk(tmp_path):
    """CSV rows are appended as each batch's analysis completes; the
    streamed file is byte-equivalent (minus the timestamped name) to a
    bulk save_results_csv over the same rows in the same order."""
    from audio_processor_tpu.host.csv_writer import save_results_csv

    seen_rows = []
    sizes_when_batch_done = []

    class _RecordingAnalyzer:
        def set_database_manager(self, db):
            pass

        def analyze_batch_sentiment(self, chunks):
            seen_rows.extend(chunks)
            return chunks

    cfg, input_dir = _error_workspace(
        tmp_path, 3, save_csv_results=True)
    proc = DataProcessor(cfg, asr_engine=_FakeOkEngine(),
                         sentiment_analyzer=_RecordingAnalyzer())

    orig = proc._append_csv_rows

    def spy(results):
        orig(results)
        p = proc._csv_stream["path"]
        sizes_when_batch_done.append(p.stat().st_size)

    proc._append_csv_rows = spy
    proc.setup_models()
    n = proc.run()
    assert n == 3
    csvs = list((tmp_path / "out").glob("optimized_results_*.csv"))
    assert len(csvs) == 1
    # Streamed: the file grew batch by batch (3 single-file batches).
    assert len(sizes_when_batch_done) == 3
    assert sizes_when_batch_done[0] < sizes_when_batch_done[1] \
        < sizes_when_batch_done[2]
    # Content identical to a bulk write of the same rows.
    bulk = save_results_csv(seen_rows, tmp_path / "bulk")
    assert csvs[0].read_text() == bulk.read_text()
    # No unbounded accumulation for the CSV path.
    assert proc._all_results == []
    proc.close()


def test_late_analysis_of_timed_out_batch_runs_on_analysis_pool(tmp_path):
    """When an abandoned (timed-out) device future eventually
    completes, its analysis is re-submitted to the single-worker
    analysis pool — never run inline on the abandoned worker's thread
    (advisor r2 finding #1: ordering + unsynchronized stats)."""
    import threading
    import time

    cfg, input_dir = _error_workspace(tmp_path, 1, timeout_seconds=1,
                                      max_errors=10)
    proc = DataProcessor(cfg, asr_engine=_HangingEngine(seconds=2.5))
    analysis_threads = []
    orig = proc._analysis_stage

    def spy(ctx):
        analysis_threads.append(threading.current_thread().name)
        return orig(ctx)

    proc._analysis_stage = spy
    files = proc.file_scanner.scan_files_parallel(input_dir)
    ok = proc.process_files_parallel(files)
    assert ok == 0 and proc.stats["errors"] >= 1
    # Wait for the abandoned worker to finish and its late analysis
    # to drain through the pool.
    deadline = time.time() + 30
    while time.time() < deadline and not analysis_threads:
        time.sleep(0.1)
    with proc._in_flight_lock:
        pass
    assert analysis_threads, "late analysis never ran"
    assert all(name.startswith("analysis")
               for name in analysis_threads), analysis_threads
    # The late analysis still wrote the marker.
    deadline = time.time() + 10
    while time.time() < deadline:
        if proc.markers.is_processed(input_dir / "c0.wav"):
            break
        time.sleep(0.1)
    assert proc.markers.is_processed(input_dir / "c0.wav")
    proc.close()


def test_analysis_overlaps_next_batch_asr(tmp_path):
    """The sentiment/persistence stage of batch N runs on the analysis
    worker while batch N+1's ASR runs on the device worker (3-stage
    producer/consumer pipeline, SURVEY.md §2.2)."""
    import threading
    import time

    events = []
    lock = threading.Lock()

    def record(name):
        with lock:
            events.append((name, time.perf_counter()))

    class _RecordingEngine(_FakeOkEngine):
        def __init__(self):
            self.calls = 0

        def transcribe_chunks(self, chunks):
            self.calls += 1
            record(f"asr_{self.calls}_start")
            time.sleep(0.15)
            record(f"asr_{self.calls}_end")
            return super().transcribe_chunks(chunks)

    class _SlowAnalyzer:
        def __init__(self):
            self.calls = 0

        def set_database_manager(self, db):
            pass

        def analyze_batch_sentiment(self, chunks):
            self.calls += 1
            record(f"analysis_{self.calls}_start")
            time.sleep(0.6)
            record(f"analysis_{self.calls}_end")
            return chunks

    cfg, input_dir = _error_workspace(tmp_path, 3)
    proc = DataProcessor(cfg, asr_engine=_RecordingEngine(),
                         sentiment_analyzer=_SlowAnalyzer())
    files = proc.file_scanner.scan_files_parallel(input_dir)
    ok = proc.process_files_parallel(files)
    assert ok == 3 and proc.stats["errors"] == 0
    t = {name: ts for name, ts in events}
    # Batch 2's ASR started before batch 1's (slow) analysis finished.
    assert t["asr_2_start"] < t["analysis_1_end"]
    # Analyses ran in batch order on the single analysis worker.
    assert t["analysis_1_end"] <= t["analysis_2_start"]
    # All three batches were fully analyzed (markers written in order).
    assert proc.stats["files_success"] == 3


def test_async_fetch_failure_leaves_files_unmarked(workspace):
    """An exception escaping the async device fetch is a batch-level
    error mirroring the sync path: no processed markers, no success
    counts, no chunk rows — the files retry on the next sweep instead
    of being silently marked done with zero transcriptions."""
    cfg, input_dir, output_dir = workspace

    class ExplodingEngine:
        def warmup(self, all_buckets=False):
            return 0

        def dispatch_chunks(self, chunks):
            def fetch():
                raise RuntimeError("simulated device failure")
            return fetch

    db = DatabaseManager(cfg.replace(db_path=str(output_dir / "x.db")))
    proc = DataProcessor(cfg, db_manager=db,
                         asr_engine=ExplodingEngine())
    proc.setup_models()
    assert proc.run() == 0
    assert proc.stats["errors"] >= 1
    assert proc.stats["files_success"] == 0
    for i in range(3):
        assert not proc.markers.is_processed(input_dir / f"call-{i}.wav")
        assert db.get_chunks_by_id_enregistrement(f"call-{i}") == []
    # A healthy engine on the next sweep picks them all up.
    proc2 = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc2.setup_models()
    assert proc2.run() == 3
    db.close()


def test_message_path_batch_failure_isolated(workspace, monkeypatch):
    """One failed batched mono transcription must not drop message
    rows for the whole file batch: the engine retries per file, so
    only a genuinely failing file loses its messages."""
    from audio_processor_tpu.pipeline.segmenter import (
        SpeechBatchTranscriber,
    )

    cfg, input_dir, output_dir = workspace
    cfg = cfg.replace(extras={**cfg.extras, "enable_message_path": True})
    db = DatabaseManager(cfg.replace(db_path=str(output_dir / "mi.db")))
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    proc._transcriber = SpeechBatchTranscriber(
        cfg, asr_engine=proc.asr_engine)
    seg = proc._transcriber.segmenter
    real = seg.transcribe_segments_batched
    calls = {"n": 0}

    def flaky(segments, sr):
        calls["n"] += 1
        if calls["n"] == 1:          # the first full-batch call
            raise RuntimeError("simulated batched failure")
        return real(segments, sr)

    monkeypatch.setattr(seg, "transcribe_segments_batched", flaky)
    proc.run()
    assert calls["n"] >= 3           # full-batch fail + per-file retries
    msgs = db.get_messages_by_id_enregistrement("call-0")
    assert len(msgs) >= 1
    orders = [m["order_message"] for m in msgs]
    assert orders == sorted(orders)
    db.close()


def test_file_batching_invariance_end_to_end(tmp_path):
    """The pipeline's OUTPUT must not depend on file batching: the
    same 5 calls through file_batch_size 1 / 2 / 5 produce identical
    per-chunk transcriptions, chunk spans and call aggregates (static
    bucket semantics all the way through decode -> ASR -> sentiment
    -> DB, not just at the chunk level as test_asr_engine's
    composition-invariance covers)."""
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    for i in range(5):
        wav.write(input_dir / f"call-{i}.wav",
                  make_stereo_call(dur=3.0 + 0.7 * i), 16000)

    def run(fbs):
        base = tmp_path / f"fbs{fbs}"
        cfg = PipelineConfig(
            input_folder=str(input_dir),
            output_folder=str(base / "out"),
            logs_folder=str(base / "logs"),
            database_type="sqlite", db_path=str(base / "db.sqlite"),
            enable_mixed_precision=False,
            chunk_duration_sec=4.0, overlap_sec=1.0,
            length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
            save_csv_results=True, file_batch_size=fbs,
        )
        db = DatabaseManager(cfg)
        run.engine = getattr(run, "engine", None) or tiny_engine(cfg)
        proc = DataProcessor(cfg, db_manager=db,
                             asr_engine=run.engine)
        proc.setup_models()
        assert proc.run() == 5
        rows = {}
        for i in range(5):
            stem = f"call-{i}"
            call = db.get_call_by_id_enregistrement(stem)
            chunks = db.get_chunks_by_id_enregistrement(stem)
            rows[stem] = {
                "duration": call["duration_seconds"],
                "agg": (call["emotion_client_globale"],
                        call["ton_agent_global"]),
                "chunks": sorted(
                    (c["id_chunk"], c["transcription_chunk"],
                     c["transcription_agent"],
                     c["transcription_client"], c["emotion_client"],
                     c["ton_agent"]) for c in chunks),
            }
        db.close()
        return rows

    r1, r2, r5 = run(1), run(2), run(5)
    assert r1 == r2 == r5


def test_ogg_opus_call_flows_through_pipeline(tmp_path):
    """A healthy stereo Ogg/Opus call scans, decodes (48 kHz Opus ->
    16 kHz resample) and transcribes through the full engine with DB
    rows landing — the happy-path twin of the corrupt-OGG test, at
    the engine level rather than the reader level."""
    pytest.importorskip("tests.opus_encoder")
    from tests.opus_encoder import encode_ogg_opus, encoder_available
    if not encoder_available():
        pytest.skip("libopus unavailable")

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    pcm = make_stereo_call(dur=4.0)          # [2, T] float at 16 kHz
    pcm48 = np.repeat(pcm, 3, axis=1)        # crude 48 kHz fixture
    (input_dir / "call-opus.opus").write_bytes(
        encode_ogg_opus(0.5 * pcm48.T, 2))

    cfg = PipelineConfig(
        input_folder=str(input_dir),
        output_folder=str(tmp_path / "output"),
        logs_folder=str(tmp_path / "logs"),
        database_type="sqlite", db_path=str(tmp_path / "db.sqlite"),
        enable_mixed_precision=False,
        chunk_duration_sec=4.0, overlap_sec=1.0,
        length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
        save_csv_results=True, file_batch_size=2,
    )
    db = DatabaseManager(cfg)
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    assert proc.run() == 1
    row = db.get_call_by_id_enregistrement("call-opus")
    assert row is not None
    assert row["duration_seconds"] == pytest.approx(4.0, abs=0.05)
    chunks = db.get_chunks_by_id_enregistrement("call-opus")
    assert chunks, "no chunk rows for the Opus call"
    assert all(isinstance(c["transcription_chunk"], str)
               for c in chunks)
    db.close()


def test_ogg_speex_call_flows_through_pipeline(tmp_path):
    """A stereo Ogg-Speex call (legacy telephony codec the reference
    inherits via ffmpeg) scans, decodes (WB 16 kHz, in-band intensity
    stereo) and transcribes through the full engine with DB rows
    landing."""
    pytest.importorskip("tests.speex_encoder")
    from tests.speex_encoder import encode_ogg_speex, encoder_available
    if not encoder_available():
        pytest.skip("libspeex unavailable")

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    pcm = make_stereo_call(dur=4.0)          # [2, T] float at 16 kHz
    (input_dir / "call-speex.ogg").write_bytes(
        encode_ogg_speex(0.5 * pcm, 16000, mode=1)[0])

    cfg = PipelineConfig(
        input_folder=str(input_dir),
        output_folder=str(tmp_path / "output"),
        logs_folder=str(tmp_path / "logs"),
        database_type="sqlite", db_path=str(tmp_path / "db.sqlite"),
        enable_mixed_precision=False,
        chunk_duration_sec=4.0, overlap_sec=1.0,
        length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
        save_csv_results=True, file_batch_size=2,
    )
    db = DatabaseManager(cfg)
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    assert proc.run() == 1
    row = db.get_call_by_id_enregistrement("call-speex")
    assert row is not None
    assert row["duration_seconds"] == pytest.approx(4.0, abs=0.1)
    chunks = db.get_chunks_by_id_enregistrement("call-speex")
    assert chunks, "no chunk rows for the Speex call"
    db.close()


def test_g711_call_flows_through_pipeline(tmp_path):
    """A stereo A-law call at 8 kHz (telephony wire format) scans,
    decodes and resamples through the full engine — proving the
    companded-WAV dispatch end to end, not just the reader."""
    import struct as _struct
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    input_dir = tmp_path / "input"
    output_dir = tmp_path / "output"
    input_dir.mkdir()
    pcm = make_stereo_call(dur=4.0)          # [2, T] float at 16 kHz
    pcm8k = pcm[:, ::2]                      # naive 8 kHz fixture
    inter = np.clip(np.round(pcm8k.T.reshape(-1) * 32768.0),
                    -32768, 32767).astype("<i2")
    payload = audioop.lin2alaw(inter.tobytes(), 2)
    p = input_dir / "call-alaw.wav"
    with open(p, "wb") as f:
        f.write(b"RIFF" + _struct.pack("<I", 36 + len(payload))
                + b"WAVE")
        f.write(b"fmt " + _struct.pack("<IHHIIHH", 16, 0x0006, 2,
                                       8000, 16000, 2, 8))
        f.write(b"data" + _struct.pack("<I", len(payload)) + payload)

    cfg = PipelineConfig(
        input_folder=str(input_dir), output_folder=str(output_dir),
        logs_folder=str(tmp_path / "logs"),
        database_type="sqlite", db_path=str(tmp_path / "db.sqlite"),
        enable_mixed_precision=False,
        chunk_duration_sec=4.0, overlap_sec=1.0,
        length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
        save_csv_results=True, file_batch_size=2,
    )
    db = DatabaseManager(cfg)
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    n = proc.run()
    assert n == 1
    chunks = db.get_chunks_by_id_enregistrement("call-alaw")
    assert chunks, "no chunk rows for the A-law call"


def test_flac_call_flows_through_pipeline(tmp_path):
    """A healthy stereo FLAC call scans, decodes (first-party FLAC
    decoder, io/flac.py) and transcribes through the full engine with
    DB rows landing — the codec's engine-level twin of the Opus test
    above."""
    from tests.flac_encoder import encode_flac

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    pcm = make_stereo_call(dur=4.0)          # [2, T] float at 16 kHz
    ints = np.clip(np.round(pcm.T * 32767), -32768, 32767) \
        .astype(np.int64)
    (input_dir / "call-flac.flac").write_bytes(
        encode_flac(ints, 16000, 16, block_size=4096,
                    ch_mode="mid_side", plan=("lpc", 8, 14),
                    part_order=2))

    cfg = PipelineConfig(
        input_folder=str(input_dir),
        output_folder=str(tmp_path / "output"),
        logs_folder=str(tmp_path / "logs"),
        database_type="sqlite", db_path=str(tmp_path / "db.sqlite"),
        enable_mixed_precision=False,
        chunk_duration_sec=4.0, overlap_sec=1.0,
        length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
        save_csv_results=True, file_batch_size=2,
    )
    db = DatabaseManager(cfg)
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    assert proc.run() == 1
    row = db.get_call_by_id_enregistrement("call-flac")
    assert row is not None
    assert row["duration_seconds"] == pytest.approx(4.0, abs=0.05)
    chunks = db.get_chunks_by_id_enregistrement("call-flac")
    assert chunks, "no chunk rows for the FLAC call"
    assert all(isinstance(c["transcription_chunk"], str)
               for c in chunks)
    db.close()


def test_mixed_format_batch_flows_through_pipeline(tmp_path):
    """One run over a mixed-format, mixed-rate input dir — 16 kHz PCM
    WAV, 8 kHz FLAC, Ogg/Vorbis, MP3, Ogg-Speex, MS-ADPCM WAV —
    exercising format dispatch, per-file resampling and file batching
    TOGETHER (each format's solo e2e can't catch cross-file batch
    interactions)."""
    from tests.flac_encoder import encode_flac
    from tests.vorbis_encoder import make_stereo_stream

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    pcm = make_stereo_call(dur=4.0)          # [2, T] float at 16 kHz
    wav.write(input_dir / "call-pcm.wav", pcm, 16000)
    pcm8k = np.ascontiguousarray(pcm[:, ::2])
    ints = np.clip(np.round(pcm8k.T * 32767), -32768, 32767) \
        .astype(np.int64)
    (input_dir / "call-flac.flac").write_bytes(
        encode_flac(ints, 8000, 16, block_size=1024,
                    ch_mode="left_side", plan=("fixed", 2)))
    (input_dir / "call-vorbis.ogg").write_bytes(
        make_stereo_stream(n_packets=24, seed=5))

    expected = ["call-flac", "call-pcm", "call-vorbis"]
    from audio_processor_tpu.io.mp3 import mpg123_available
    from tests.mp3_encoder import encoder_available as lame_available
    if lame_available() and mpg123_available():
        from tests.mp3_encoder import encode_mp3

        (input_dir / "call-mp3.mp3").write_bytes(
            encode_mp3(np.ascontiguousarray(pcm.T), 16000))
        expected.append("call-mp3")
    from tests.speex_encoder import encoder_available as spx_available
    if spx_available():
        from tests.speex_encoder import encode_ogg_speex

        (input_dir / "call-speex.ogg").write_bytes(
            encode_ogg_speex(pcm, 16000, mode=1)[0])
        expected.append("call-speex")
    from tests.test_io import _make_ms_adpcm_wav

    adpcm, _total, _ = _make_ms_adpcm_wav(
        np.random.default_rng(11), ch=2, block_align=512, n_blocks=64)
    (input_dir / "call-adpcm.wav").write_bytes(adpcm)
    expected.append("call-adpcm")
    expected.sort()

    cfg = PipelineConfig(
        input_folder=str(input_dir),
        output_folder=str(tmp_path / "output"),
        logs_folder=str(tmp_path / "logs"),
        database_type="sqlite", db_path=str(tmp_path / "db.sqlite"),
        enable_mixed_precision=False,
        chunk_duration_sec=4.0, overlap_sec=1.0,
        length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
        save_csv_results=True, file_batch_size=3,
    )
    db = DatabaseManager(cfg)
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    assert proc.run() == len(expected)
    for name in expected:
        row = db.get_call_by_id_enregistrement(name)
        assert row is not None, f"{name} missing"
        chunks = db.get_chunks_by_id_enregistrement(name)
        assert chunks, f"no chunk rows for {name}"
    # the two same-content calls (PCM vs FLAC-compressed telephony
    # downsample) must transcribe; durations must reflect each file
    assert db.get_call_by_id_enregistrement("call-pcm")[
        "duration_seconds"] == pytest.approx(4.0, abs=0.05)
    assert db.get_call_by_id_enregistrement("call-flac")[
        "duration_seconds"] == pytest.approx(4.0, abs=0.05)
    db.close()


def test_chunk_level_device_errors_fail_the_file(workspace):
    """Per-chunk device errors (dispatch/fetch exceptions swallowed
    into rows with 'error' set) must FAIL the file — previously those
    files were marked .done with empty transcriptions and skipped
    forever, with the max_errors gate blind to a dying device."""
    cfg, input_dir, output_dir = workspace

    class ChunkErrorEngine:
        def warmup(self, all_buckets=False):
            return 0

        def dispatch_chunks(self, chunks):
            def fetch():
                return [{"file_name": c.file_name,
                         "chunk_idx": c.chunk_idx,
                         "start_time": c.start_time,
                         "end_time": c.end_time,
                         "transcription_chunk": "",
                         "agent_transcription": "",
                         "client_transcription": "",
                         "error": "ASR dispatch failed (simulated)"}
                        for c in chunks]
            return fetch

    db = DatabaseManager(cfg.replace(db_path=str(output_dir / "x.db")))
    proc = DataProcessor(cfg, db_manager=db,
                         asr_engine=ChunkErrorEngine())
    proc.setup_models()
    assert proc.run() == 0
    assert proc.stats["files_success"] == 0
    assert proc.stats["files_failed"] == 3
    assert proc.stats["errors"] >= 3       # gate sees the failures
    for i in range(3):
        assert not proc.markers.is_processed(input_dir / f"call-{i}.wav")
    assert len(proc.failed_files) == 3
    db.close()


def test_failed_files_skip_within_process_retry_after_change(
        workspace, monkeypatch):
    """A file that failed this process is skipped on later sweeps
    (watch mode must not re-burn the error budget on permanently-bad
    files every sweep) but retries once the file changes on disk."""
    import os
    from pathlib import Path

    import audio_processor_tpu.pipeline.engine as engine_mod
    from audio_processor_tpu.io import native as native_mod

    cfg, input_dir, output_dir = workspace
    bad = input_dir / "call-1.wav"
    real_load = engine_mod.load_audio
    failing = {"on": True}

    def flaky_load(path):
        if failing["on"] and Path(path).name == "call-1.wav":
            raise RuntimeError("simulated decode failure")
        return real_load(path)

    monkeypatch.setattr(engine_mod, "load_audio", flaky_load)
    monkeypatch.setattr(native_mod, "available", lambda: False)

    db = DatabaseManager(cfg.replace(db_path=str(output_dir / "y.db")))
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    assert proc.run() == 2                     # 2 good, 1 failed
    assert proc.stats["files_failed"] == 1
    n_failed_entries = len(proc.failed_files)

    # Sweep 2: the bad file is skipped, not retried.
    errors_before = proc.stats["errors"]
    assert proc.run() == 0
    assert proc.stats["errors"] == errors_before
    assert len(proc.failed_files) == n_failed_entries  # no duplicates

    # File "re-uploaded" (mtime changes) and now decodable -> retried.
    failing["on"] = False
    os.utime(bad, (os.path.getmtime(bad) + 5,) * 2)
    assert proc.run() == 1
    assert proc.markers.is_processed(bad)
    db.close()


def test_watch_summaries_report_per_sweep_deltas(workspace):
    """Watch mode reuses one processor; each run summary must report
    that sweep's counters and latencies, not process-lifetime totals
    against one sweep's duration."""
    import json as _json

    cfg, input_dir, output_dir = workspace
    db = DatabaseManager(cfg.replace(db_path=str(output_dir / "z.db")))
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    assert proc.run() == 3
    s1 = _json.loads(proc.log_results()["summary"].read_text())
    assert s1["files_success"] == 3

    # Sweep 2: two new files.
    for i in (7, 8):
        wav.write(input_dir / f"late-{i}.wav",
                  make_stereo_call(dur=4.0), 16000)
    assert proc.run() == 2
    s2 = _json.loads(proc.log_results()["summary"].read_text())
    assert s2["files_success"] == 2            # NOT 5
    assert s2["files_processed"] == 2
    assert s2["files_skipped"] == 3            # sweep-1 files .done
    db.close()


def test_vad_failure_preserves_existing_message_rows(workspace):
    """A transient VAD failure during reprocess must not wipe the
    call's existing message rows (None from get_speech_segments_multi
    is an error, not silence; the idempotent refresh is skipped)."""
    cfg = workspace[0].replace(
        extras={"enable_message_path": True}, vad_max_segment_sec=4.0)
    _, input_dir, output_dir = workspace
    db = DatabaseManager(cfg.replace(db_path=str(output_dir / "m.db")))
    proc = DataProcessor(cfg, db_manager=db, asr_engine=tiny_engine(cfg))
    proc.setup_models()
    assert proc.run() == 3
    before = db.get_messages_by_id_enregistrement("call-0")
    assert before, "seed run produced no message rows"

    # Clear markers so the files reprocess, then fail ALL VAD work.
    import shutil

    shutil.rmtree(proc.markers.dir, ignore_errors=True)

    from audio_processor_tpu.pipeline import segmenter as seg_mod

    orig = seg_mod.SpeechSegment.get_speech_segments_multi
    try:
        seg_mod.SpeechSegment.get_speech_segments_multi = \
            lambda self, channels, sr: [None] * len(channels)
        assert proc.run() == 3
    finally:
        seg_mod.SpeechSegment.get_speech_segments_multi = orig

    after = db.get_messages_by_id_enregistrement("call-0")
    assert [m["text"] for m in after] == [m["text"] for m in before]
    db.close()
