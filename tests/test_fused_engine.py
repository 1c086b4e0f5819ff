"""Fused device-program tests: transcription + acoustic features in
one dispatch, int16 wire format, equivalence with the separate paths."""

import numpy as np
import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.pipeline.chunker import split_audio

from tests.conftest import make_stereo_call
from tests.test_engine_e2e import tiny_engine


def _engine(fuse, int16):
    cfg = PipelineConfig(enable_mixed_precision=False,
                         chunk_duration_sec=4.0, overlap_sec=1.0,
                         length_buckets_sec=(2.0, 4.0), chunk_batch_size=4)
    cfg = cfg.replace(extras={"fuse_acoustic_features": fuse,
                              "int16_transfers": int16})
    return tiny_engine(cfg), cfg


def _int16_exact_call():
    """A call whose samples are exactly representable as int16."""
    call = make_stereo_call(dur=9.0)
    return np.round(call * 32767).astype(np.int16).astype(np.float32) \
        / 32768.0


def test_fused_matches_separate_paths():
    call = _int16_exact_call()
    chunks = split_audio(call, 16000, "c.wav", 4.0, 1.0)
    eng_f, _ = _engine(fuse=True, int16=True)
    eng_s, _ = _engine(fuse=False, int16=False)
    out_f = eng_f.transcribe_chunks(chunks)
    out_s = eng_s.transcribe_chunks(
        split_audio(call, 16000, "c.wav", 4.0, 1.0))
    for a, b in zip(out_f, out_s):
        assert a["transcription_chunk"] == b["transcription_chunk"]
        assert a["agent_transcription"] == b["agent_transcription"]
        assert a["client_transcription"] == b["client_transcription"]
        assert a["error"] == b["error"] == ""


def test_fused_features_match_standalone_extractor():
    from audio_processor_tpu.dsp.acoustic_features import (
        extract_features_batch, prepare_reflect_padded,
    )

    call = _int16_exact_call()
    chunks = split_audio(call, 16000, "c.wav", 4.0, 1.0)
    eng, _ = _engine(fuse=True, int16=True)
    out = eng.transcribe_chunks(chunks)
    for row, c in zip(out, chunks):
        assert "agent_acoustic_features" in row
        buf, lens = prepare_reflect_padded(
            [c.agent], bucket_len=c.num_samples)
        ref = np.asarray(extract_features_batch(buf, lens))[0]
        got = row["agent_acoustic_features"]
        scale = np.maximum(np.abs(ref), 1.0)
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-4)


def test_fused_partial_batch_padding():
    """Fewer chunks than the device batch: results must be unaffected
    by the zero-padded slots."""
    call = _int16_exact_call()[:, : 16000 * 4]
    chunks = split_audio(call, 16000, "c.wav", 4.0, 1.0)  # 1 chunk
    eng, _ = _engine(fuse=True, int16=True)
    out = eng.transcribe_chunks(chunks)
    assert len(out) == 1 and out[0]["error"] == ""

    call9 = _int16_exact_call()
    chunks9 = split_audio(call9, 16000, "c.wav", 4.0, 1.0)
    out9 = eng.transcribe_chunks(chunks9)
    # chunk 0 of the 4s call == chunk 0 of the 9s call (same audio)
    np.testing.assert_array_equal(call[:, :16000 * 4],
                                  call9[:, :16000 * 4])
    assert out[0]["transcription_chunk"] == out9[0]["transcription_chunk"]


def test_sentiment_uses_precomputed_features(monkeypatch):
    """When chunks carry fused features, the acoustic analyzer must not
    re-extract from waveforms."""
    from audio_processor_tpu.pipeline import sentiment as sent_mod

    cfg = PipelineConfig()
    an = sent_mod.SentimentAnalyzer(cfg)  # models unavailable -> empty

    called = {"extract": 0}
    orig = an.acoustic_analyzer.extract_features

    def spy(*a, **k):
        called["extract"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(an.acoustic_analyzer, "extract_features", spy)
    chunks = [{
        "file_name": "c.wav", "chunk_idx": 0,
        "agent_transcription": "salam labas", "client_transcription":
        "chokran bzaf", "agent_waveform": np.zeros(8000, np.float32),
        "client_waveform": np.zeros(8000, np.float32),
        "agent_acoustic_features": np.zeros(38, np.float32),
        "client_acoustic_features": np.zeros(38, np.float32),
    }]
    an.analyze_batch_sentiment(chunks)
    assert called["extract"] == 0


def test_native_prepare_matches_numpy():
    """C++ ap_prepare_fused must produce byte-identical buffers to the
    numpy reflect-pad + round + clip path."""
    from audio_processor_tpu.dsp.acoustic_features import (
        PAD, prepare_reflect_padded,
    )
    from audio_processor_tpu.io import native

    if not native.has_prepare_fused():
        pytest.skip("native prepare not built")
    rng = np.random.default_rng(0)
    lens = [5000, 16000, 123, 0]
    agents = [rng.standard_normal(n).astype(np.float32) * 0.9
              for n in lens]
    clients = [rng.standard_normal(n).astype(np.float32) * 0.9
               for n in lens]
    L = 16000
    got = native.prepare_fused_int16(agents, clients,
                                     np.array(lens, np.int64), L, PAD)
    assert got is not None and got.shape == (4, 2, L + 2 * PAD)

    waves = []
    for a, c in zip(agents, clients):
        waves.append(a)
        waves.append(c)
    ref_f, _ = prepare_reflect_padded(waves, L)
    ref = np.clip(np.round(ref_f * 32768.0), -32768, 32767) \
        .astype(np.int16).reshape(4, 2, L + 2 * PAD)
    np.testing.assert_array_equal(got, ref)
