"""Tests for auxiliary subsystems: monitor, checkpoint cache, system
utils, profiler, markers/retention."""

import time

import numpy as np
import pytest

from audio_processor_tpu.config import PipelineConfig


def test_monitor_batch_metrics_and_report(tmp_path):
    from audio_processor_tpu.obs.monitor import PerformanceMonitor

    m = PerformanceMonitor(PipelineConfig(), interval_sec=0.05)
    m.add_callback("queues", lambda: {"decode_queue": 3})
    m.start_monitoring()
    m.record_batch(0, num_files=4, num_chunks=10, seconds=2.0,
                   audio_seconds=100.0)
    m.record_batch(1, num_files=4, num_chunks=12, seconds=3.0,
                   audio_seconds=110.0)
    time.sleep(0.3)
    m.stop_monitoring()
    s = m.get_performance_summary()
    assert s["files_processed"] == 8
    assert s["batches_recorded"] == 2
    assert s["avg_batch_seconds"] == pytest.approx(2.5)
    assert s["throughput"]["files_per_hour"] > 0
    p = m.save_performance_report(tmp_path)
    assert p.exists()
    import json

    report = json.loads(p.read_text())
    assert len(report["batch_metrics"]) == 2
    assert any("queues" in cb for cb in report["callbacks"])


def test_monitor_tuners():
    from audio_processor_tpu.obs.monitor import PerformanceMonitor

    m = PerformanceMonitor(PipelineConfig())
    # too-slow batches halve the batch size
    for i in range(5):
        m.record_batch(i, 4, 10, seconds=60.0, audio_seconds=10)
    assert m.optimize_batch_size(16, target_batch_seconds=30.0) == 8
    m2 = PerformanceMonitor(PipelineConfig())
    for i in range(5):
        m2.record_batch(i, 4, 10, seconds=5.0, audio_seconds=10)
    assert m2.optimize_batch_size(16, target_batch_seconds=30.0) == 32


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from audio_processor_tpu.models.checkpoint import load_params, save_params

    params = {"a": {"kernel": jnp.arange(6.0).reshape(2, 3)},
              "b": jnp.ones((4,))}
    save_params(params, tmp_path / "ckpt", metadata={"config": {"x": 1}})
    restored, meta = load_params(tmp_path / "ckpt")
    np.testing.assert_allclose(np.asarray(restored["a"]["kernel"]),
                               np.arange(6.0).reshape(2, 3))
    assert meta == {"config": {"x": 1}}


def test_load_or_convert_caches(tmp_path):
    """Second load must come from the Orbax cache, not reconversion."""
    import json

    from tests.test_wav2vec2bert import tiny_hf_model

    model, _ = tiny_hf_model(vocab_size=16, seed=3)
    d = tmp_path / "hf"
    model.save_pretrained(d)
    (d / "vocab.json").write_text(json.dumps(
        {"<pad>": 0, "a": 1, "b": 2}))
    from transformers import Wav2Vec2CTCTokenizer

    Wav2Vec2CTCTokenizer(str(d / "vocab.json"),
                         pad_token="<pad>").save_pretrained(d)

    from audio_processor_tpu.models import checkpoint as ckpt

    p1, cfg1, vocab1 = ckpt.load_or_convert_w2v_bert(d)
    assert ckpt.cache_dir_for(d).exists()

    import audio_processor_tpu.models.convert_hf as conv

    def boom(*a, **k):
        raise AssertionError("should restore from cache, not reconvert")

    orig = conv.load_w2v_bert_from_pretrained
    conv.load_w2v_bert_from_pretrained = boom
    try:
        p2, cfg2, vocab2 = ckpt.load_or_convert_w2v_bert(d)
    finally:
        conv.load_w2v_bert_from_pretrained = orig
    assert cfg2 == cfg1
    np.testing.assert_allclose(
        np.asarray(p1["lm_head"]["kernel"]),
        np.asarray(p2["lm_head"]["kernel"]))


def test_system_utils():
    from audio_processor_tpu.utils.system import (
        check_device_availability, get_system_stats, pad_chunk_waveforms,
    )

    ok, msg = check_device_availability()
    assert isinstance(msg, str)  # CPU in tests -> ok is False
    stats = get_system_stats()
    assert "memory_percent" in stats
    stacked = pad_chunk_waveforms([np.ones((2, 5)), np.ones((2, 3))])
    assert stacked.shape == (2, 2, 5)
    assert stacked[1, 0, 3] == 0


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp

    from audio_processor_tpu.obs.profiler import annotate, maybe_trace, trace

    with trace(tmp_path / "prof"):
        with annotate("matmul"):
            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert any((tmp_path / "prof").rglob("*"))
    # no-op path
    with maybe_trace(PipelineConfig()):
        pass


def test_retention_cleanup(tmp_path):
    import os

    from audio_processor_tpu.pipeline.markers import (
        ProcessedMarkers, cleanup_old_artifacts,
    )

    cfg = PipelineConfig(retention_days=1, delete_processed_files=True,
                         input_folder=str(tmp_path / "in"))
    (tmp_path / "in").mkdir()
    markers = ProcessedMarkers(tmp_path / "markers")
    temp = tmp_path / "temp"
    inter = tmp_path / "inter"
    temp.mkdir()
    inter.mkdir()

    old_file = temp / "old.bin"
    old_file.write_bytes(b"x")
    two_days_ago = time.time() - 2 * 86400
    os.utime(old_file, (two_days_ago, two_days_ago))
    (temp / "new.bin").write_bytes(b"y")

    audio = tmp_path / "in" / "done.wav"
    audio.write_bytes(b"wav")
    markers.mark_processed(audio)
    marker_path = markers.dir / "done.done"
    os.utime(marker_path, (two_days_ago, two_days_ago))

    deleted = cleanup_old_artifacts(cfg, markers, temp, inter)
    assert not old_file.exists()
    assert (temp / "new.bin").exists()
    assert not audio.exists()  # processed audio past retention removed
    assert deleted >= 2


def test_memory_recommendations():
    from audio_processor_tpu.obs.monitor import PerformanceMonitor

    recs = PerformanceMonitor(PipelineConfig()).get_memory_recommendations()
    assert recs["recommendations"]


def test_optimal_device_count():
    from audio_processor_tpu.parallel.multi_device import (
        get_optimal_device_count,
    )

    assert get_optimal_device_count() == 8  # virtual CPU mesh
    assert get_optimal_device_count(max_devices=4) == 4


def test_cli_stats(tmp_path):
    import json

    import yaml

    from audio_processor_tpu.cli import main
    from audio_processor_tpu.host.db import DatabaseManager

    cfg = PipelineConfig(database_type="sqlite",
                         db_path=str(tmp_path / "s.db"),
                         input_folder=str(tmp_path),
                         logs_folder=str(tmp_path / "logs"))
    db = DatabaseManager(cfg)
    db.insert_call({"id_enregistrement": "x"})
    db.close()
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({
        "database_type": "sqlite", "db_path": str(tmp_path / "s.db"),
        "input_folder": str(tmp_path),
        "output_folder": str(tmp_path / "out"),
        "logs_folder": str(tmp_path / "logs")}))
    rc = main(["--config", str(p), "--stats"])
    assert rc == 0


def test_monitor_reference_api_surface(tmp_path):
    """Round-2 parity completion: the reference's remaining public
    monitor methods (performance_monitor.py:322-363)."""
    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.obs.monitor import PerformanceMonitor

    m = PerformanceMonitor(PipelineConfig())
    assert m.get_performance_recommendations(10.0, 100.0) == \
        ["Throughput is very low. Check for bottlenecks."]
    assert m.get_performance_recommendations(70.0, 100.0) == \
        ["Throughput is below target. Consider optimization."]
    assert m.get_performance_recommendations(95.0, 100.0) == []
    mem = m.get_current_gpu_memory()
    assert isinstance(mem, dict)
    assert all(isinstance(v, float) for v in mem.values())
    m.log_gpu_memory_status()  # must not raise


def test_sentiment_analyzer_reference_api_surface():
    """pretty_sentiment + load_models on the coordinator
    (sentiment_analysis.py:50-63, 437-443)."""
    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.pipeline.sentiment import SentimentAnalyzer

    a = SentimentAnalyzer(PipelineConfig())
    assert a.pretty_sentiment(None) == "Vide"
    assert a.pretty_sentiment("tres mecontent") == "Très Mécontent"
    assert a.pretty_sentiment("aggressive") == "Agressif"
    assert a.pretty_sentiment("unknown_label") == "Unknown_label"
    a.load_models()  # rebuild; analyzers stay consistent
    assert a.late_fusion_analyzer.agent_id2label == \
        a.acoustic_analyzer.agent_acoustic_id2label
