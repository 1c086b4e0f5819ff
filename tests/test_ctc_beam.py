"""CTC prefix beam search vs brute-force alignment enumeration."""

import itertools
import math

import numpy as np
import pytest

from audio_processor_tpu.models.ctc_beam import (
    batch_beam_decode, ctc_beam_search,
)
from audio_processor_tpu.models.tokenizer import CTCVocab, decode_ids


@pytest.fixture
def vocab():
    return CTCVocab({"<pad>": 0, "|": 1, "a": 2, "b": 3})


def brute_force_best(log_probs, vocab):
    """Sum alignment probabilities per collapsed string exactly."""
    T, V = log_probs.shape
    scores = {}
    for path in itertools.product(range(V), repeat=T):
        lp = sum(log_probs[t, s] for t, s in enumerate(path))
        text = decode_ids(list(path), vocab)
        if text in scores:
            m = max(scores[text], lp)
            scores[text] = m + math.log(
                math.exp(scores[text] - m) + math.exp(lp - m))
        else:
            scores[text] = lp
    return sorted(scores.items(), key=lambda kv: -kv[1])


def _rand_log_probs(rng, T, V):
    logits = rng.standard_normal((T, V)) * 1.5
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return np.log(e / e.sum(-1, keepdims=True))


def _merge_by_text(hyps):
    """Beam hypotheses are distinct prefix sequences; different
    prefixes can strip to the same display text (e.g. delimiter-only
    prefixes -> ''). Merge like the brute force does."""
    merged = {}
    for text, lp in hyps:
        if text in merged:
            m = max(merged[text], lp)
            merged[text] = m + math.log(
                math.exp(merged[text] - m) + math.exp(lp - m))
        else:
            merged[text] = lp
    return sorted(merged.items(), key=lambda kv: -kv[1])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam_matches_brute_force(vocab, seed):
    rng = np.random.default_rng(seed)
    lp = _rand_log_probs(rng, T=5, V=4)
    ref = brute_force_best(lp, vocab)
    hyps = _merge_by_text(ctc_beam_search(lp, vocab, beam_width=1024))
    assert hyps[0][0] == ref[0][0]
    assert hyps[0][1] == pytest.approx(ref[0][1], abs=1e-6)


def test_beam_beats_or_matches_greedy(vocab):
    """Beam search's top hypothesis never scores below greedy's."""
    rng = np.random.default_rng(42)
    for _ in range(10):
        lp = _rand_log_probs(rng, T=6, V=4)
        ref = dict(brute_force_best(lp, vocab))
        greedy = decode_ids(lp.argmax(-1).tolist(), vocab)
        beam = _merge_by_text(
            ctc_beam_search(lp, vocab, beam_width=1024))[0][0]
        assert ref[beam] >= ref[greedy] - 1e-9


def test_batch_beam_decode_with_mask(vocab):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 6, 4)).astype(np.float32)
    mask = np.ones((2, 6), bool)
    mask[1, 4:] = False
    out = batch_beam_decode(logits, vocab, mask=mask, beam_width=8)
    assert len(out) == 2
    assert all(isinstance(t, str) for t in out)
    # masked frames must not affect the result
    logits2 = logits.copy()
    logits2[1, 4:] = 100.0
    out2 = batch_beam_decode(logits2, vocab, mask=mask, beam_width=8)
    assert out2[1] == out[1]


def test_message_path_beam_decoding_engine():
    """beam_width > 1 routes the mono message path through prefix beam
    search over the device log posteriors; results equal running
    ctc_beam_search directly on the same posteriors."""
    import jax
    import jax.numpy as jnp

    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.models.ctc_beam import ctc_beam_search

    from tests.conftest import make_stereo_call
    from tests.test_engine_e2e import tiny_engine

    cfg = PipelineConfig(enable_mixed_precision=False,
                         chunk_duration_sec=4.0, overlap_sec=1.0,
                         length_buckets_sec=(2.0, 4.0),
                         chunk_batch_size=2,
                         extras={"beam_width": 4})
    engine = tiny_engine(cfg)
    assert engine.beam_width == 4
    waves = [make_stereo_call(dur=2.0)[0], make_stereo_call(dur=3.5)[0]]
    texts = engine.transcribe_mono_segments(waves)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)

    # oracle: same posteriors through ctc_beam_search directly
    from audio_processor_tpu.pipeline.chunker import chunk_batch, Chunk

    chunks = [Chunk("", i, 0.0, 0.0, mixed=np.asarray(w, np.float32))
              for i, w in enumerate(waves)]
    expect = {}
    for batch in chunk_batch(chunks, engine.bucket_samples):
        rows = batch.audio[:, 0, :]
        n = rows.shape[0]
        B = engine.device_batch
        pad = (-n) % B
        rows = np.concatenate(
            [rows, np.zeros((pad, batch.bucket_len), np.float32)])
        lens = np.concatenate(
            [batch.lengths, np.full((pad,), batch.bucket_len, np.int32)])
        lp, mask = engine._logits_fn(batch.bucket_len)(
            engine.params, rows, lens)
        lp, mask = np.asarray(lp), np.asarray(mask).astype(bool)
        for j, c in enumerate(batch.chunks):
            hyp = ctc_beam_search(lp[j], engine.vocab, beam_width=4,
                                  mask=mask[j])[0][0]
            expect[c.chunk_idx] = hyp
    assert texts == [expect[0], expect[1]]

    # greedy default unchanged
    cfg_g = cfg.replace(extras={})
    assert tiny_engine(cfg_g).beam_width == 1
