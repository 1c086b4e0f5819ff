"""Tests for VAD, merge/pad/window rules, Darija conversion, and the
mono message path."""

import numpy as np
import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.models import vad as vad_mod
from audio_processor_tpu.pipeline.segmenter import (
    SpeechBatchTranscriber, SpeechSegment, extract_windows, merge_segments,
)


def test_merge_segments_reference_rules():
    # gaps <= 0.8 merge (reference: speech_segment.py:366-383)
    tl = [(0.0, 1.0), (1.5, 2.0), (3.5, 4.0)]
    assert merge_segments(tl, 0.8) == [(0.0, 2.0), (3.5, 4.0)]
    assert merge_segments([], 0.8) == []
    assert merge_segments([(1.0, 2.0)], 0.8) == [(1.0, 2.0)]
    # exactly equal gap merges (<=)
    assert merge_segments([(0, 1), (1.8, 2)], 0.8) == [(0, 2)]


def test_extract_windows_padding_and_split():
    # 30 s segment, pad 0.5, max 25, overlap 0.5
    wins = extract_windows(60.0, [(5.0, 35.0)], padding=0.5,
                           max_len_sec=25.0, overlap=0.5)
    assert wins[0] == (4.5, 29.5)
    # next window starts at 29.5 - 0.5 = 29.0
    assert wins[1] == (29.0, 35.5)
    # padding clamps to [0, total]
    wins2 = extract_windows(10.0, [(0.2, 9.8)], 0.5, 25.0, 0.5)
    assert wins2 == [(0.0, 10.0)]


def test_extract_windows_min_advance():
    # pathological tiny max_len: cur advances by at least 0.1
    wins = extract_windows(10.0, [(0.0, 1.0)], 0.0, 0.05, 0.5)
    assert len(wins) <= 16
    assert all(e > s for s, e in wins)


def test_energy_vad_detects_bursts():
    sr = 16000
    n = sr * 6
    x = np.zeros(n, np.float32)
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    x[sr:2 * sr] = tone          # speech at 1-2 s
    x[4 * sr:5 * sr] = tone      # speech at 4-5 s
    probs, mask = vad_mod.energy_vad_probs(
        x[None, :], np.array([n], np.int32))
    probs = np.asarray(probs)[0]
    segs = vad_mod.binarize(probs, 160 / sr)
    assert len(segs) == 2
    (s1, e1), (s2, e2) = segs
    assert abs(s1 - 1.0) < 0.1 and abs(e1 - 2.0) < 0.1
    assert abs(s2 - 4.0) < 0.1 and abs(e2 - 5.0) < 0.1


def test_binarize_hysteresis_and_min_durations():
    hop = 0.01
    probs = np.array([0.1] * 10 + [0.9] * 10 + [0.1] * 5 + [0.9] * 3
                     + [0.1] * 10)
    segs = vad_mod.binarize(probs, hop)
    assert len(segs) == 2
    merged = vad_mod.binarize(probs, hop, min_duration_off=0.1)
    assert len(merged) == 1
    filtered = vad_mod.binarize(probs, hop, min_duration_on=0.05)
    assert len(filtered) == 1  # the 3-frame segment is dropped


def test_pyannet_forward_shapes():
    import jax

    cfg = vad_mod.PyanNetConfig(lstm_layers=1, lstm_hidden=16,
                                sinc_filters=8, conv_channels=8,
                                linear_hidden=16)
    params = vad_mod.init_pyannet(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).standard_normal((2, 16000)) \
        .astype(np.float32)
    probs = np.asarray(vad_mod.pyannet_forward(params, cfg, x))
    assert probs.shape[0] == 2
    assert probs.shape[1] > 0
    assert np.all((probs >= 0) & (probs <= 1))


def test_speech_segment_end_to_end(tmp_path):
    """Energy VAD + segmentation + tiny ASR engine message path."""
    import jax

    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.models.tokenizer import CTCVocab
    from audio_processor_tpu.pipeline.asr_engine import ASREngine

    cfg = PipelineConfig(enable_mixed_precision=False,
                         length_buckets_sec=(2.0, 5.0, 10.0, 25.0))
    vocab = CTCVocab.darija_default()
    mcfg = w2v.W2VBertConfig(vocab_size=len(vocab), hidden_size=32,
                             num_hidden_layers=1, num_attention_heads=2,
                             intermediate_size=64,
                             conv_depthwise_kernel_size=7,
                             left_max_position_embeddings=8,
                             right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), mcfg)
    engine = ASREngine(cfg, params=params, model_cfg=mcfg, vocab=vocab)

    sr = 16000
    x = np.zeros(sr * 8, np.float32)
    t = np.arange(sr * 2) / sr
    x[sr:3 * sr] = (0.4 * np.sin(2 * np.pi * 250 * t)).astype(np.float32)

    trans = SpeechBatchTranscriber(cfg, asr_engine=engine)
    messages = trans.transcribe_mono(x, sr, "agent")
    assert len(messages) >= 1
    m = messages[0]
    assert m["speaker"] == "agent"
    assert m["start"] < m["end"]
    assert isinstance(m["text"], str)
    # padding of 0.5s applied around the 1s start
    assert abs(m["start"] - 0.5) < 0.15


def test_get_speech_segments_multi_matches_sequential():
    """The batched multi-channel entry point (engine regime: dispatch
    every channel's VAD before fetching any) returns exactly the
    per-channel results of sequential get_speech_segments, for both
    the PyanNet and the energy detector."""
    import jax

    sr = 16000
    rng = np.random.default_rng(3)
    chans = []
    for i in range(4):
        x = np.zeros(sr * (6 + i), np.float32)
        t = np.arange(sr * 2) / sr
        s = sr * (1 + i % 2)
        x[s:s + sr * 2] = (0.4 * np.sin(2 * np.pi * (200 + 40 * i) * t)
                           + 0.01 * rng.standard_normal(sr * 2)
                           ).astype(np.float32)
        chans.append((x, "agent" if i % 2 == 0 else "client"))

    def check(seg):
        multi = seg.get_speech_segments_multi(chans, sr)
        for (wav, label), got in zip(chans, multi):
            want = seg.get_speech_segments(wav, sr, label)
            assert len(got) == len(want)
            for g, w in zip(got, want):
                assert (g["start"], g["end"], g["speaker"]) == \
                    (w["start"], w["end"], w["speaker"])
                np.testing.assert_array_equal(
                    g["segment_waveform"], w["segment_waveform"])

    seg = SpeechSegment(PipelineConfig())      # energy fallback
    check(seg)
    vcfg = vad_mod.PyanNetConfig(sinc_filters=8, conv_channels=6,
                                 lstm_hidden=8, linear_hidden=8,
                                 lstm_layers=1, linear_layers=1)
    seg._vad_cfg = vcfg
    seg._vad_params = vad_mod.init_pyannet(jax.random.PRNGKey(0), vcfg)
    check(seg)


def test_darija_converter_with_xlsx(tmp_path):
    """Build a real xlsx via a minimal writer and round-trip through
    the first-party reader + converter."""
    from audio_processor_tpu.host.darija import DarijaFrenchConverter
    from tests.xlsx_writer import write_xlsx

    fr = tmp_path / "fr.xlsx"
    write_xlsx(fr, {"Sheet1": [
        ["French", "Variante 1", "Variante 2"],
        ["bonjour", "salam", "slm"],
        ["merci", "chokran", None],
    ]})
    nums = tmp_path / "nums.xlsx"
    write_xlsx(nums, {"Sheet1": [
        ["Nombre", "Variante 1", "Variante 2"],
        [1, "wahed", "wa7ed"],
        [2, "jouj", "zouj"],
    ]})
    cfg = PipelineConfig(darija_french_dict=str(fr),
                         darija_numbers_dict=str(nums))
    conv = DarijaFrenchConverter(cfg)
    assert conv.mapping["salam"] == "bonjour"
    assert conv.word_to_number["jouj"] == 2
    out = conv.convert_text("salam khouya chokran")
    assert "bonjour" in out and "merci" in out
    # fuzzy number replacement ('wahed' exact, 'zouj' exact)
    out2 = conv.convert_text("wahed zouj telephone")
    assert out2.startswith("1 2 ")


def test_fuzzy_ratio_fallback_matches_rapidfuzz():
    import audio_processor_tpu.host.darija as dar

    pytest.importorskip("rapidfuzz")
    from rapidfuzz import fuzz

    # first-party LCS-based ratio must match rapidfuzz fuzz.ratio
    cases = [("wahed", "wa7ed"), ("jouj", "zouj"), ("salam", "salam"),
             ("abc", "xyz"), ("", "a")]
    for a, b in cases:
        la, lb = len(a), len(b)
        prev = [0] * (lb + 1)
        for i in range(1, la + 1):
            cur = [0] * (lb + 1)
            for j in range(1, lb + 1):
                cur[j] = (prev[j - 1] + 1 if a[i - 1] == b[j - 1]
                          else max(prev[j], cur[j - 1]))
            prev = cur
        ours = 100.0 * 2 * prev[lb] / (la + lb) if la + lb else 100.0
        assert abs(ours - fuzz.ratio(a, b)) < 1e-9


def test_multi_dispatch_failure_does_not_shift_channels(monkeypatch):
    """A VAD dispatch exception on one channel must yield [] for THAT
    channel only — later channels keep their own audio (a monos/
    pendings length skew paired channel k+1's probs with channel k's
    waveform and transcribed the wrong speaker)."""
    sr = 16000
    rng = np.random.default_rng(5)
    chans = []
    for i in range(3):
        x = np.zeros(sr * 6, np.float32)
        t = np.arange(sr * 2) / sr
        s = sr * (1 + i)
        x[s:s + sr * 2] = (0.4 * np.sin(2 * np.pi * (200 + 60 * i) * t)
                           + 0.01 * rng.standard_normal(sr * 2)
                           ).astype(np.float32)
        chans.append((x, f"spk{i}"))

    seg = SpeechSegment(PipelineConfig())
    want = [seg.get_speech_segments(w, sr, lab) for w, lab in chans]

    orig = seg._vad_dispatch
    calls = {"n": 0}

    def flaky(flat, rate):
        calls["n"] += 1
        if calls["n"] == 2:          # channel index 1 fails
            raise RuntimeError("synthetic device error")
        return orig(flat, rate)

    monkeypatch.setattr(seg, "_vad_dispatch", flaky)
    got = seg.get_speech_segments_multi(chans, sr)
    assert got[1] is None      # FAILED — distinct from no-speech []
    for idx in (0, 2):
        assert len(got[idx]) == len(want[idx]) > 0
        for g, w in zip(got[idx], want[idx]):
            assert (g["start"], g["end"]) == (w["start"], w["end"])
            np.testing.assert_array_equal(g["segment_waveform"],
                                          w["segment_waveform"])


def test_stereo_transcribe_mono_uses_vad_channel():
    """segment_waveform from a [2, T] input is the single channel the
    VAD ran on — keeping both channels made the batched flatten
    concatenate ch0-audio + ch1-audio into one doubled 'mono' wave."""
    sr = 16000
    t = np.arange(sr * 2) / sr
    x = np.zeros((2, sr * 6), np.float32)
    x[0, sr:sr * 3] = 0.4 * np.sin(2 * np.pi * 220 * t)
    x[1, sr:sr * 3] = 0.4 * np.sin(2 * np.pi * 330 * t)

    seg = SpeechSegment(PipelineConfig())
    segs = seg.get_speech_segments(x, sr, "stereo")
    assert segs
    for s in segs:
        wf = np.asarray(s["segment_waveform"])
        assert wf.shape[0] == 1            # the VAD'd channel only
        span = wf.shape[1]
        start = int(s["start"] * sr)
        np.testing.assert_array_equal(
            wf[0], x[0, start:start + span])


def test_pyannet_vad_resamples_other_rates():
    """An 8 kHz input to a PyanNet segmenter must produce segment
    TIMES matching the same audio at 16 kHz (the model's rate) — the
    windows/hop are sized in model samples."""
    import jax

    from audio_processor_tpu.dsp.resample import resample_np

    sr16 = 16000
    rng = np.random.default_rng(7)
    t = np.arange(sr16 * 2) / sr16
    x16 = np.zeros(sr16 * 8, np.float32)
    x16[sr16:sr16 * 3] = (0.4 * np.sin(2 * np.pi * 220 * t)
                          + 0.01 * rng.standard_normal(sr16 * 2)
                          ).astype(np.float32)
    x8 = resample_np(x16[None, :], sr16, 8000)[0]

    vcfg = vad_mod.PyanNetConfig(sinc_filters=8, conv_channels=6,
                                 lstm_hidden=8, linear_hidden=8,
                                 lstm_layers=1, linear_layers=1)
    seg = SpeechSegment(PipelineConfig())
    seg._vad_cfg = vcfg
    seg._vad_params = vad_mod.init_pyannet(jax.random.PRNGKey(0), vcfg)

    segs16 = seg.get_speech_segments(x16, sr16, "a")
    segs8 = seg.get_speech_segments(x8, 8000, "a")
    assert len(segs16) == len(segs8) >= 1
    for a, b in zip(segs16, segs8):
        assert a["start"] == pytest.approx(b["start"], abs=0.05)
        assert a["end"] == pytest.approx(b["end"], abs=0.05)
        # and the 8 kHz slice indexes 8 kHz audio (half the samples)
        assert np.asarray(b["segment_waveform"]).shape[1] == \
            pytest.approx(
                np.asarray(a["segment_waveform"]).shape[1] / 2, abs=2)
