"""Word-level CTC timestamps (models/tokenizer.decode_words + the
engine's emit_word_timestamps flag) — beyond the reference, which
returns plain text only."""

import numpy as np
import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.models.tokenizer import (
    CTCVocab, batch_decode_words, decode_ids, decode_words,
)

from tests.conftest import make_stereo_call
from tests.test_engine_e2e import tiny_engine


@pytest.fixture
def vocab():
    return CTCVocab({"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3,
                     "|": 4, "a": 5, "b": 6, "c": 7})


def test_word_spans_basic(vocab):
    # frames (20ms): a a _ b | _ c  -> words "ab" [0,0.08), "c" [0.12,0.14)
    ids = [5, 5, 0, 6, 4, 0, 7]
    words = decode_words(ids, vocab, frame_sec=0.02)
    assert words == [
        {"word": "ab", "start": 0.0, "end": 0.08},
        {"word": "c", "start": 0.12, "end": 0.14},
    ]
    # text decode agrees with word concatenation
    assert decode_ids(ids, vocab) == "ab c"


def test_repeat_frames_extend_char_not_word_count(vocab):
    # a a a | b b  -> "a" spans 3 frames, "b" spans 2
    ids = [5, 5, 5, 4, 6, 6]
    words = decode_words(ids, vocab, frame_sec=0.02)
    assert words == [
        {"word": "a", "start": 0.0, "end": 0.06},
        {"word": "b", "start": 0.08, "end": 0.12},
    ]


def test_ctc_repeat_rule_no_double_emission(vocab):
    # a _ a collapses to "aa"? No: blank separates -> two 'a' chars in
    # ONE word (no delimiter); a a (no blank) is a single emission.
    assert [w["word"] for w in decode_words([5, 0, 5], vocab, 0.02)] \
        == ["aa"]
    assert [w["word"] for w in decode_words([5, 5], vocab, 0.02)] == ["a"]


def test_offset_and_specials(vocab):
    ids = [1, 5, 2, 4, 6]   # specials skipped; delimiter splits
    words = decode_words(ids, vocab, 0.02, offset_sec=10.0)
    assert words[0]["word"] == "a" and words[0]["start"] == 10.02
    assert words[1]["word"] == "b"


def test_batch_decode_words_masks_and_offsets(vocab):
    ids = np.array([[5, 4, 6, 6], [7, 7, 7, 5]])
    mask = np.array([[1, 1, 1, 1], [1, 1, 0, 0]], bool)
    out = batch_decode_words(ids, vocab, 0.02, mask=mask,
                             offsets_sec=[0.0, 1.0])
    assert [w["word"] for w in out[0]] == ["a", "b"]
    assert [w["word"] for w in out[1]] == ["c"]
    assert out[1][0]["start"] == 1.0 and out[1][0]["end"] == 1.04


def test_engine_emits_word_timestamps():
    cfg = PipelineConfig(
        enable_mixed_precision=False, chunk_duration_sec=4.0,
        overlap_sec=1.0, length_buckets_sec=(2.0, 4.0),
        chunk_batch_size=4, extras={"emit_word_timestamps": True})
    engine = tiny_engine(cfg)
    from audio_processor_tpu.pipeline.chunker import split_audio

    chunks = split_audio(make_stereo_call(dur=7.0), 16000, "c.wav",
                         4.0, 1.0)
    rows = engine.transcribe_chunks(chunks)
    assert all(r["error"] == "" for r in rows)
    for r in rows:
        for key in ("mixed_words", "agent_words", "client_words"):
            words = r[key]
            assert isinstance(words, list)
            for w in words:
                # spans inside the chunk, in call time, monotonic
                assert r["start_time"] <= w["start"] < w["end"] \
                    <= r["end_time"] + 0.021
            starts = [w["start"] for w in words]
            assert starts == sorted(starts)

    # flag off -> no word keys (no silent cost)
    cfg2 = cfg.replace(extras={})
    rows2 = tiny_engine(cfg2).transcribe_chunks(
        split_audio(make_stereo_call(dur=4.0), 16000, "c.wav", 4.0, 1.0))
    assert "agent_words" not in rows2[0]


def test_repeated_specials_do_not_extend_previous_char(vocab):
    """Regression: a repeated special/out-of-vocab id after a character
    run must not extend that character's end time."""
    words = decode_words([5, 3, 3], vocab, 0.02)   # a <unk> <unk>
    assert words == [{"word": "a", "start": 0.0, "end": 0.02}]
    words = decode_words([5, 99, 99], vocab, 0.02)  # a oov oov
    assert words == [{"word": "a", "start": 0.0, "end": 0.02}]
    # but a repeated CHARACTER still extends
    words = decode_words([5, 5, 5], vocab, 0.02)
    assert words == [{"word": "a", "start": 0.0, "end": 0.06}]
