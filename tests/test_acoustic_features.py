"""Parity of the batched JAX acoustic-feature extractor against a
torch oracle that follows the reference's formulas
(services/sentiment_analysis.py:807-894) using torch's own stft/unfold/
conv1d — an implementation path independent from the JAX one."""

import numpy as np
import pytest
import torch

from audio_processor_tpu.dsp import mfcc as mfcc_mod
from audio_processor_tpu.dsp.acoustic_features import (
    FEATURE_NAMES, NUM_FEATURES, extract_features_batch,
    prepare_reflect_padded,
)

SR = 16000


def torch_oracle_features(y: np.ndarray) -> np.ndarray:
    """Reference-formula oracle (torch CPU, float32)."""
    y = torch.from_numpy(np.asarray(y, np.float32))
    frame_length = int(0.025 * SR)
    hop = int(0.010 * SR)
    if y.numel() < frame_length:
        return np.zeros(NUM_FEATURES, np.float32)

    frames = y.unfold(0, frame_length, hop)
    rms = torch.sqrt(torch.mean(frames ** 2, dim=1))
    signs = torch.sign(frames)
    zc = ((signs[:, :-1] * signs[:, 1:]) < 0).sum(dim=1).float() / frame_length

    n_fft = 512
    window = torch.hann_window(frame_length)
    stft = torch.stft(y, n_fft=n_fft, hop_length=hop, win_length=frame_length,
                      window=window, return_complex=True)
    mag = stft.abs()
    freqs = torch.linspace(0, SR / 2, mag.shape[0])
    energy = mag.sum(dim=0) + 1e-8
    centroid = (mag * freqs.unsqueeze(1)).sum(dim=0) / energy
    diff_sq = (freqs.unsqueeze(1) - centroid.unsqueeze(0)) ** 2
    bandwidth = torch.sqrt((mag * diff_sq).sum(dim=0) / energy)
    cum = mag.cumsum(dim=0)
    thresh = 0.85 * (cum[-1] + 1e-8)
    roll_idx = ((cum >= thresh).float().argmax(dim=0)).long()
    roll_freqs = freqs[roll_idx]

    # MFCC: torchaudio.transforms.MFCC semantics built from the same
    # torch.stft power + HTK mel bank + amplitude_to_db + ortho DCT.
    power = (stft.abs() ** 2).T                              # [T, 257]
    mel_bank = torch.from_numpy(
        mfcc_mod.htk_mel_filters(257, 128, SR))              # [257, 128]
    mel = power @ mel_bank
    db = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    dct = torch.from_numpy(mfcc_mod.dct_matrix(13, 128))     # [128, 13]
    mfcc = (db @ dct).T                                      # [13, T]

    flux = torch.relu(mag[:, 1:] - mag[:, :-1]).sum(dim=0)
    onset = flux.unsqueeze(0).unsqueeze(0)
    autocorr = torch.nn.functional.conv1d(
        onset, onset, padding=onset.shape[-1] - 1).squeeze()
    autocorr[0] = 0
    max_lag = autocorr.argmax()
    period = max_lag.item() * hop / SR if max_lag > 0 else 0.0
    tempo = 60.0 / period if period > 0 else 0.0

    vals = [rms.mean(), rms.std(), rms.max() - rms.min(),
            zc.mean(), zc.std(),
            centroid.mean(), centroid.std(),
            bandwidth.mean(), bandwidth.std(),
            roll_freqs.mean(), roll_freqs.std(),
            torch.tensor(tempo)]
    mf_mean, mf_std = mfcc.mean(dim=1), mfcc.std(dim=1)
    for i in range(13):
        vals += [mf_mean[i], mf_std[i]]
    return np.array([float(v) for v in vals], np.float32)


def test_feature_names_count():
    assert len(FEATURE_NAMES) == NUM_FEATURES == 38
    assert FEATURE_NAMES[0] == "rms_mean"
    assert FEATURE_NAMES[11] == "tempo"
    assert FEATURE_NAMES[12] == "mfcc_0_mean"
    assert FEATURE_NAMES[-1] == "mfcc_12_std"


def test_dct_matrix_vs_scipy():
    import scipy.fft
    ours = mfcc_mod.dct_matrix(13, 128)
    ref = scipy.fft.dct(np.eye(128), type=2, norm="ortho", axis=0)[:13].T
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_htk_mel_filters_vs_transformers():
    from transformers.audio_utils import mel_filter_bank
    ours = mfcc_mod.htk_mel_filters(257, 128, SR)
    ref = mel_filter_bank(num_frequency_bins=257, num_mel_filters=128,
                          min_frequency=0.0, max_frequency=SR / 2,
                          sampling_rate=SR, norm=None, mel_scale="htk")
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def _signal(rng, n):
    # Speech-ish: noise with AM tone bursts, non-degenerate spectrum.
    t = np.arange(n) / SR
    x = 0.1 * rng.standard_normal(n)
    x += 0.3 * np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
    return x.astype(np.float32)


@pytest.mark.parametrize("n", [16000, 40000, 400, 560, 65123])
def test_parity_vs_torch_oracle(rng, n):
    x = _signal(rng, n)
    ref = torch_oracle_features(x)
    buf, lengths = prepare_reflect_padded([x], bucket_len=n)
    ours = np.asarray(extract_features_batch(buf, lengths))[0]
    assert ours.shape == (NUM_FEATURES,)
    both_nan = np.isnan(ref) & np.isnan(ours)
    ref_c, ours_c = ref[~both_nan], ours[~both_nan]
    scale = np.maximum(np.abs(ref_c), 1.0)
    np.testing.assert_allclose(ours_c / scale, ref_c / scale,
                               atol=2e-3, err_msg=str(FEATURE_NAMES))


def test_too_short_audio_zero_features(rng):
    x = _signal(rng, 100)  # < one 400-sample frame
    buf, lengths = prepare_reflect_padded([x], bucket_len=16000)
    ours = np.asarray(extract_features_batch(buf, lengths))[0]
    np.testing.assert_array_equal(ours, np.zeros(NUM_FEATURES))


def test_batch_padding_invariance(rng):
    """Features of a chunk must not depend on other chunks in the
    batch or on the bucket padding."""
    x1, x2 = _signal(rng, 16000), _signal(rng, 9000)
    buf, lengths = prepare_reflect_padded([x1, x2], bucket_len=16000)
    batch = np.asarray(extract_features_batch(buf, lengths))
    solo_buf, solo_len = prepare_reflect_padded([x2], bucket_len=9000)
    solo = np.asarray(extract_features_batch(solo_buf, solo_len))[0]
    scale = np.maximum(np.abs(solo), 1.0)
    np.testing.assert_allclose(batch[1] / scale, solo / scale, atol=2e-4)


def test_single_frame_std_is_nan(rng):
    """400..559 samples -> exactly one unfold frame -> torch std is
    NaN; downstream gating relies on this (sentiment_analysis.py:757-760)."""
    x = _signal(rng, 450)
    buf, lengths = prepare_reflect_padded([x], bucket_len=16000)
    ours = np.asarray(extract_features_batch(buf, lengths))[0]
    idx_std = FEATURE_NAMES.index("rms_std")
    assert np.isnan(ours[idx_std])
