"""Parity of the JAX fbank frontend vs HF SeamlessM4TFeatureExtractor
(the exact frontend Wav2Vec2BertProcessor applies in the reference,
services/audio_processor.py:253-261)."""

import numpy as np
import pytest

from audio_processor_tpu.dsp import fbank

transformers = pytest.importorskip("transformers")
from transformers import SeamlessM4TFeatureExtractor  # noqa: E402


@pytest.fixture(scope="module")
def extractor():
    return SeamlessM4TFeatureExtractor(
        feature_size=80, num_mel_bins=80, sampling_rate=16000, stride=2)


def _rand_audio(rng, n):
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_mel_filters_match_hf(extractor):
    ours = fbank.kaldi_mel_filters()
    np.testing.assert_allclose(ours, extractor.mel_filters, atol=1e-6)


def test_povey_window_matches_hf(extractor):
    from audio_processor_tpu.dsp.stft import povey_window
    np.testing.assert_allclose(povey_window(400), extractor.window, atol=1e-12)


@pytest.mark.parametrize("n_samples", [16000, 40000, 16000 * 5 + 160])
def test_single_utterance_matches_hf(extractor, rng, n_samples):
    audio = _rand_audio(rng, n_samples)
    ref = extractor([audio], sampling_rate=16000, return_tensors="np",
                    padding=True)
    feats, mask = fbank.log_mel_frontend(audio[None, :],
                                         np.array([n_samples], np.int32))
    feats = np.asarray(feats)
    ref_feats = ref["input_features"]
    assert feats.shape == ref_feats.shape
    np.testing.assert_allclose(feats, ref_feats, atol=2e-3, rtol=1e-3)
    # Normalized features ~N(0,1): mean abs error must be tiny.
    assert np.mean(np.abs(feats - ref_feats)) < 5e-5
    np.testing.assert_array_equal(np.asarray(mask),
                                  ref["attention_mask"].astype(bool))


def test_batch_with_padding_matches_hf(extractor, rng):
    lens = [16000, 24000, 40000]
    audios = [_rand_audio(rng, n) for n in lens]
    ref = extractor(audios, sampling_rate=16000, return_tensors="np",
                    padding=True)
    T = max(lens)
    batch = np.zeros((len(lens), T), np.float32)
    for i, a in enumerate(audios):
        batch[i, :len(a)] = a
    feats, mask = fbank.log_mel_frontend(batch, np.array(lens, np.int32))
    feats, mask = np.asarray(feats), np.asarray(mask)
    assert feats.shape == ref["input_features"].shape
    np.testing.assert_array_equal(mask, ref["attention_mask"].astype(bool))
    # Compare only valid positions (HF pads with 0 as well, but be safe).
    m = mask[..., None]
    np.testing.assert_allclose(feats * m, ref["input_features"] * m,
                               atol=2e-3, rtol=1e-3)
    assert np.mean(np.abs(feats * m - ref["input_features"] * m)) < 5e-5


def test_float64_reference_path_matches_hf(extractor, rng):
    audio = _rand_audio(rng, 16000)
    ours = fbank.log_mel_frontend_np(audio)
    ref = extractor._extract_fbank_features(audio)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-5)


def test_masked_stats_ignore_padding(rng):
    """Padding a sequence must not change its features."""
    audio = _rand_audio(rng, 16000)
    f1, m1 = fbank.log_mel_frontend(audio[None, :],
                                    np.array([16000], np.int32))
    padded = np.zeros((1, 32000), np.float32)
    padded[0, :16000] = audio
    f2, m2 = fbank.log_mel_frontend(padded, np.array([16000], np.int32))
    n = np.asarray(m1).sum()
    assert np.asarray(m2).sum() == n
    # The padded batch is a different XLA program (different shape),
    # so the per-utterance mean/var reductions may associate
    # differently; a few 1e-5-scale fp32 wobbles on O(1) normalized
    # features are expected and machine-dependent (observed max
    # 1.01e-5 on a 1-core host, under 1e-5 elsewhere).
    np.testing.assert_allclose(np.asarray(f2)[0, :f1.shape[1]],
                               np.asarray(f1)[0], atol=5e-5)
