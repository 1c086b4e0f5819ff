"""End-to-end ASR engine tests, including transcript bit-match vs the
reference's torch pipeline (HF processor + Wav2Vec2BertForCTC + greedy
batch_decode + text cleaning — services/audio_processor.py:247-296) on
a tiny random checkpoint."""

import json

import numpy as np
import pytest
import torch

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.models.tokenizer import CTCVocab
from audio_processor_tpu.pipeline.asr_engine import ASREngine
from audio_processor_tpu.pipeline.chunker import split_audio
from audio_processor_tpu.utils.text import remove_special_characters

from tests.test_wav2vec2bert import tiny_hf_model


VOCAB = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4,
         "a": 5, "b": 6, "c": 7, "d": 8, "e": 9, "f": 10, "g": 11,
         "h": 12, "i": 13, "j": 14, "k": 15, "l": 16, "m": 17,
         "n": 18, "o": 19, "p": 20, "q": 21, "r": 22, "s": 23,
         "t": 24, "u": 25, "v": 26, "w": 27, "x": 28, "y": 29,
         "z": 30, "0": 31}


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    model, _ = tiny_hf_model(vocab_size=32, seed=1)
    model.save_pretrained(d)
    (d / "vocab.json").write_text(json.dumps(VOCAB))
    from transformers import (SeamlessM4TFeatureExtractor,
                              Wav2Vec2BertProcessor, Wav2Vec2CTCTokenizer)

    tok = Wav2Vec2CTCTokenizer(str(d / "vocab.json"), pad_token="<pad>",
                               word_delimiter_token="|")
    fe = SeamlessM4TFeatureExtractor(feature_size=80, num_mel_bins=80,
                                     sampling_rate=16000, stride=2)
    Wav2Vec2BertProcessor(feature_extractor=fe, tokenizer=tok) \
        .save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def engine(checkpoint_dir):
    cfg = PipelineConfig(transcription_model=str(checkpoint_dir),
                         enable_mixed_precision=False,
                         chunk_batch_size=4,
                         length_buckets_sec=(2.0, 4.0))
    return ASREngine(cfg)


def torch_reference_transcribe(checkpoint_dir, arrays):
    """The reference's inference path (audio_processor.py:247-296)."""
    from transformers import Wav2Vec2BertForCTC, Wav2Vec2BertProcessor

    model = Wav2Vec2BertForCTC.from_pretrained(
        checkpoint_dir, torch_dtype=torch.float32,
        attn_implementation="eager")
    model.eval()
    processor = Wav2Vec2BertProcessor.from_pretrained(checkpoint_dir)
    inputs = processor(arrays, sampling_rate=16000, return_tensors="pt",
                       padding=True)
    with torch.no_grad():
        logits = model(input_features=inputs["input_features"],
                       attention_mask=inputs["attention_mask"]).logits
    # Reference decodes raw argmax ids without masking padded frames;
    # emulate the mask here because HF zero-pads features identically.
    ids = torch.argmax(logits, dim=-1)
    texts = processor.batch_decode(ids)
    return [remove_special_characters(t) for t in texts]


def test_transcripts_match_torch_reference(engine, checkpoint_dir, rng):
    sr = 16000
    arrays = [
        (0.1 * rng.standard_normal(int(sr * d))).astype(np.float32)
        for d in (2.0, 2.0, 2.0)
    ]
    ref_texts = torch_reference_transcribe(checkpoint_dir, arrays)
    got = engine.transcribe_mono_segments(arrays)
    assert got == ref_texts


def test_transcribe_chunks_structure(engine, stereo_call):
    chunks = split_audio(stereo_call, 16000, "call1.wav",
                         chunk_duration_sec=4.0, overlap_sec=1.0)
    out = engine.transcribe_chunks(chunks)
    assert len(out) == len(chunks)
    for i, row in enumerate(out):
        assert row["file_name"] == "call1.wav"
        assert row["chunk_idx"] == i
        assert row["error"] == ""
        for k in ("transcription_chunk", "agent_transcription",
                  "client_transcription"):
            assert isinstance(row[k], str)
    # agent/client waveforms are preserved for the sentiment stage
    assert out[0]["agent_waveform"].shape[0] == 4 * 16000


def test_batch_composition_invariance(engine, rng):
    """A chunk's transcript must not depend on which other chunks
    share its device batch (static bucket semantics)."""
    sr = 16000
    waves = [(0.1 * rng.standard_normal(int(sr * d))).astype(np.float32)
             for d in (1.0, 2.0, 3.5, 4.0, 1.7)]
    together = engine.transcribe_mono_segments(waves)
    solo = [engine.transcribe_mono_segments([w])[0] for w in waves]
    assert together == solo


def test_synthetic_mode_without_checkpoint(tmp_path):
    cfg = PipelineConfig(transcription_model=str(tmp_path / "nope"),
                         enable_mixed_precision=False)
    # Full-size model init is slow; use a tiny explicit model instead.
    from audio_processor_tpu.models import wav2vec2bert as w2v
    import jax

    vocab = CTCVocab.darija_default()
    mcfg = w2v.W2VBertConfig(vocab_size=len(vocab), hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=2,
                             intermediate_size=64,
                             conv_depthwise_kernel_size=7,
                             left_max_position_embeddings=8,
                             right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), mcfg)
    eng = ASREngine(cfg, params=params, model_cfg=mcfg, vocab=vocab)
    out = eng.transcribe_mono_segments(
        [np.zeros(16000, np.float32)])
    assert len(out) == 1 and isinstance(out[0], str)


def test_bucket_guard_for_long_chunks():
    """chunk_duration_sec beyond the largest bucket must extend the
    bucket set (silent truncation would corrupt transcripts)."""
    import jax

    from audio_processor_tpu.models import wav2vec2bert as w2v

    cfg = PipelineConfig(enable_mixed_precision=False,
                         chunk_duration_sec=8.0,
                         length_buckets_sec=(2.0, 4.0))
    vocab = CTCVocab.darija_default()
    mcfg = w2v.W2VBertConfig(vocab_size=len(vocab), hidden_size=32,
                             num_hidden_layers=1, num_attention_heads=2,
                             intermediate_size=64,
                             conv_depthwise_kernel_size=7,
                             left_max_position_embeddings=8,
                             right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), mcfg)
    eng = ASREngine(cfg, params=params, model_cfg=mcfg, vocab=vocab)
    assert max(eng.bucket_samples) == 8 * 16000
    from audio_processor_tpu.pipeline.chunker import split_audio

    wf = np.random.default_rng(0).standard_normal(
        (2, 16000 * 8)).astype(np.float32) * 0.1
    out = eng.transcribe_chunks(split_audio(wf, 16000, "c.wav", 8.0, 1.0))
    assert out[0]["error"] == ""


def test_mono_rows_int16_wire_bit_identical(engine, rng):
    """PCM16-exact mono segments take the int16 wire in _run_rows
    (half the upload bytes) with BIT-IDENTICAL transcripts; non-exact
    (e.g. resampled) audio falls back to the f32 wire."""
    pcm = rng.integers(-12000, 12000, (3, int(1.7 * 16000)))
    pcm[0, 0] = -32768   # full-scale-negative clipping must not
    pcm[1, 1] = 32767    # disqualify the wire (both are int16-exact)
    waves = [(p.astype(np.float32) / 32768.0) for p in pcm]

    seen = []
    outs = []
    orig = engine._device_fn

    def spy(bucket_len):
        fn = orig(bucket_len)

        def wrapped(params, audio, lengths):
            seen.append(np.asarray(audio).dtype)
            out = fn(params, audio, lengths)
            outs.append(out)
            return out
        return wrapped

    engine._device_fn = spy
    try:
        texts16 = engine.transcribe_mono_segments(waves)
        engine.int16_transfers = False
        texts32 = engine.transcribe_mono_segments(waves)
    finally:
        engine._device_fn = orig
        engine.int16_transfers = True

    assert seen[0] == np.int16 and seen[-1] == np.float32
    assert texts16 == texts32
    # BIT-identical on the raw device outputs, not just the decoded
    # transcripts (greedy argmax can mask logit drift).
    ids16, mask16 = outs[0]
    ids32, mask32 = outs[-1]
    np.testing.assert_array_equal(np.asarray(ids16), np.asarray(ids32))
    np.testing.assert_array_equal(np.asarray(mask16),
                                  np.asarray(mask32))

    # Non-exact input: wire must not engage even with the flag on.
    seen.clear()
    engine._device_fn = spy
    try:
        engine.transcribe_mono_segments(
            [waves[0] + np.float32(1e-6)])
    finally:
        engine._device_fn = orig
    assert all(d == np.float32 for d in seen)


def test_warmup_covers_message_row_programs(checkpoint_dir):
    """With the message path enabled, warmup() must also compile the
    mono-rows programs (every bucket x the three static row sizes) —
    otherwise the first message batch pays cold compiles inside the
    300 s analysis timeout and a healthy device reads as hung."""
    cfg = PipelineConfig(transcription_model=str(checkpoint_dir),
                         enable_mixed_precision=False,
                         chunk_batch_size=4,
                         length_buckets_sec=(2.0, 4.0),
                         chunk_duration_sec=4.0,
                         vad_max_segment_sec=4.0,
                         extras={"enable_message_path": True})
    eng = ASREngine(cfg)
    n1 = eng.warmup()
    row_keys = [k for k in eng._jit_cache
                if isinstance(k, int) or (isinstance(k, tuple)
                                          and k[0] == "logits")]
    assert row_keys, "no mono-rows programs compiled by warmup"
    assert len(eng.bucket_samples) == 2
    assert {k for k in eng._jit_cache if isinstance(k, int)} == \
        set(eng.bucket_samples)
    assert eng.warmup() == 0           # idempotent
    assert n1 > 0


def test_bucket_guard_covers_vad_max_segment(checkpoint_dir):
    """vad_max_segment_sec beyond the largest bucket must extend the
    bucket set when the message path is on (segments longer than the
    bucket were silently truncated by the dense batcher)."""
    cfg = PipelineConfig(transcription_model=str(checkpoint_dir),
                         enable_mixed_precision=False,
                         chunk_duration_sec=4.0, chunk_batch_size=4,
                         length_buckets_sec=(2.0, 4.0),
                         vad_max_segment_sec=6.0,
                         extras={"enable_message_path": True})
    eng = ASREngine(cfg)
    assert max(eng.bucket_samples) == 6 * 16000
    # off: unchanged (reference parity default)
    cfg2 = PipelineConfig(transcription_model=str(checkpoint_dir),
                          enable_mixed_precision=False,
                          chunk_duration_sec=4.0, chunk_batch_size=4,
                          length_buckets_sec=(2.0, 4.0),
                          vad_max_segment_sec=6.0)
    assert max(ASREngine(cfg2).bucket_samples) == 4 * 16000
