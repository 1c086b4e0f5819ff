"""Tests for the reference-compatible AudioProcessor facade
(services/audio_processor.py public API)."""

import numpy as np
import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.io import wav
from audio_processor_tpu.pipeline.facades import AudioProcessor

from tests.conftest import make_stereo_call
from tests.test_engine_e2e import tiny_engine


@pytest.fixture
def processor(tmp_path):
    cfg = PipelineConfig(enable_mixed_precision=False,
                         chunk_duration_sec=4.0, overlap_sec=1.0,
                         length_buckets_sec=(2.0, 4.0), chunk_batch_size=4)
    ap = AudioProcessor(cfg)
    ap.engine = tiny_engine(cfg)  # avoid full-size synthetic init
    return ap


def test_load_audio(processor, tmp_path, stereo_call):
    p = tmp_path / "c.wav"
    wav.write(p, stereo_call, 16000)
    waveform, sr = processor.load_audio(p)
    assert sr == 16000
    assert waveform.shape == stereo_call.shape


def test_split_audio_contract(processor, stereo_call):
    chunks, agent, client = processor.split_audio(stereo_call, 16000,
                                                  "c.wav")
    # reference contract: list of dicts with these keys
    # (audio_processor.py:144-152)
    assert {"file_name", "stereo_waveform", "agent_waveform",
            "client_waveform", "chunk_idx", "start_time",
            "end_time"} <= set(chunks[0])
    assert agent.shape[0] == stereo_call.shape[1]
    np.testing.assert_allclose(chunks[0]["stereo_waveform"],
                               stereo_call.mean(0)[:4 * 16000])


def test_split_audio_resamples(processor):
    wf8k = np.random.default_rng(0).standard_normal(
        (2, 8000 * 2)).astype(np.float32) * 0.1
    chunks, agent, client = processor.split_audio(wf8k, 8000, "c.wav")
    assert agent.shape[0] == 16000 * 2  # resampled to 16 kHz


def test_transcribe_batch_updates_dicts(processor, stereo_call):
    chunks, _, _ = processor.split_audio(stereo_call, 16000, "c.wav")
    out = processor.transcribe_batch(chunks)
    assert out is chunks  # in-place contract
    for c in chunks:
        assert "transcription_chunk" in c
        assert "agent_transcription" in c
        assert "client_transcription" in c
        assert c["error"] == ""


def test_process_batch_and_failed_files(processor, tmp_path, stereo_call):
    good = tmp_path / "good.wav"
    wav.write(good, stereo_call, 16000)
    missing = tmp_path / "missing.wav"
    results = processor.process_batch(0, [good, missing])
    assert len(results) >= 1
    assert all(r["file_name"] == "good.wav" for r in results)
    assert any(f["filename"] == "missing.wav"
               for f in processor.failed_files)


def test_db_call_row_written(processor, tmp_path, stereo_call):
    class FakeDB:
        def __init__(self):
            self.calls = []

        def insert_call(self, data):
            self.calls.append(data)

    db = FakeDB()
    processor.db_manager = db
    p = tmp_path / "call9.wav"
    wav.write(p, stereo_call, 16000)
    processor._process_single_file(p)
    assert db.calls[0]["id_enregistrement"] == "call9"
    assert db.calls[0]["duration_seconds"] == pytest.approx(10.0, abs=0.01)


def test_ogg_through_facade(processor):
    """Real Vorbis file -> first-party decode -> resample 11k->16k ->
    chunk -> transcribe (mono files are valid through the facade; only
    the scanner rejects them)."""
    import pathlib

    ogg = pathlib.Path("/opt/venv/lib/python3.12/site-packages/pygame/"
                       "examples/data/house_lo.ogg")
    if not ogg.exists():
        pytest.skip("no ogg sample")
    results = processor.process_batch(0, [ogg])
    assert len(results) >= 1
    assert all(r["error"] == "" for r in results)
    assert results[0]["file_name"] == "house_lo.ogg"
    # 7.1s @ 11025 resampled to 16k, 4s chunks/1s overlap -> 3 chunks
    assert len(results) == 3
