"""Kaldi-style log-mel fbank frontend for Wav2Vec2Bert.

Numerics match the HF ``SeamlessM4TFeatureExtractor`` (the frontend
behind ``Wav2Vec2BertProcessor`` used by the reference at
services/audio_processor.py:253-261): 25 ms Povey-windowed frames,
10 ms hop, per-frame DC removal and 0.97 pre-emphasis, 512-point power
spectrum, 80 Kaldi-mel (1127·ln(1+f/700)) triangular filters
(fmin 20 Hz, triangularized in mel space), natural log with floor
2^-23, per-utterance per-mel-bin normalization (ddof=1), then stride-2
frame stacking to 160-dim features.

TPU-first: fully batched, mask-aware (padded samples don't pollute the
normalization statistics), static shapes per length bucket, DFT + mel
projection as MXU matmuls.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.dsp.stft import (
    dft_matrices, frame_signal, povey_window,
)

FRAME_LENGTH = 400   # 25 ms @ 16 kHz
HOP_LENGTH = 160     # 10 ms
FFT_LENGTH = 512
NUM_MEL_BINS = 80
MEL_FLOOR = 1.192092955078125e-07  # 2**-23
PREEMPHASIS = 0.97
STRIDE = 2


def hertz_to_kaldi_mel(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


@functools.lru_cache(maxsize=4)
def kaldi_mel_filters(num_frequency_bins: int = 257,
                      num_mel_filters: int = NUM_MEL_BINS,
                      min_frequency: float = 20.0,
                      max_frequency: float = 8000.0,
                      sampling_rate: int = 16000) -> np.ndarray:
    """[num_frequency_bins, num_mel_filters] triangular bank, Kaldi
    mel scale, triangularized in mel space, no normalization."""
    mel_min = hertz_to_kaldi_mel(min_frequency)
    mel_max = hertz_to_kaldi_mel(max_frequency)
    mel_pts = np.linspace(mel_min, mel_max, num_mel_filters + 2)

    fft_bin_width = sampling_rate / ((num_frequency_bins - 1) * 2)
    fft_mels = hertz_to_kaldi_mel(fft_bin_width * np.arange(num_frequency_bins))

    # Triangles in mel space.
    fdiff = np.diff(mel_pts)
    slopes = mel_pts[None, :] - fft_mels[:, None]           # [bins, mels+2]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    bank = np.maximum(0.0, np.minimum(down, up))
    return bank.astype(np.float32)


def _num_frames(length):
    return jnp.maximum(0, 1 + (length - FRAME_LENGTH) // HOP_LENGTH)


def full_num_frames(padded_length: int) -> int:
    return max(0, 1 + (padded_length - FRAME_LENGTH) // HOP_LENGTH)


def max_num_frames(padded_length: int) -> int:
    # HF pads the frame axis up to a multiple of `stride` before
    # stacking (pad_to_multiple_of=2), so round up, not down.
    n = full_num_frames(padded_length)
    return n + (-n) % STRIDE


def num_output_frames(padded_length: int) -> int:
    return max_num_frames(padded_length) // STRIDE


@functools.partial(jax.jit, static_argnames=("dither",))
def log_mel_frontend(waveform: jnp.ndarray,
                     lengths: jnp.ndarray,
                     dither: float = 0.0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fbank + normalization + stride-2 stacking.

    Args:
      waveform: [B, T] float32, zero-padded; T static per bucket.
      lengths: [B] int32 valid sample counts.

    Returns:
      features: [B, T2, 160]  (T2 = max_num_frames(T) // 2), masked
        positions are 0.
      mask: [B, T2] bool attention mask for the encoder.
    """
    B, T = waveform.shape
    # Stats are computed over all frames of each utterance (including a
    # possible trailing odd frame), matching the HF extractor which
    # normalizes before stride truncation.
    n_full = full_num_frames(T)
    n_frames = max_num_frames(T)
    if n_frames <= 0:
        raise ValueError(f"bucket length {T} shorter than one frame")

    x = waveform.astype(jnp.float32) * 32768.0  # Kaldi int16 compliance
    frames = frame_signal(x, FRAME_LENGTH, HOP_LENGTH, n_full)   # [B,F,400]

    # Per-frame DC removal then pre-emphasis (Kaldi order).
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    pre = frames[..., 1:] - PREEMPHASIS * frames[..., :-1]
    first = frames[..., :1] * (1.0 - PREEMPHASIS)
    frames = jnp.concatenate([first, pre], axis=-1)

    window = jnp.asarray(povey_window(FRAME_LENGTH), dtype=jnp.float32)
    frames = frames * window

    # HIGHEST precision: TPU's default bf16 matmul costs ~1% error in
    # the power spectrum, which log() amplifies. The frontend is a tiny
    # share of pipeline FLOPs, so full-fp32 passes are cheap.
    hi = jax.lax.Precision.HIGHEST
    cos_m, msin_m = dft_matrices(FRAME_LENGTH, FFT_LENGTH)
    re = jnp.matmul(frames, jnp.asarray(cos_m), precision=hi,
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, jnp.asarray(msin_m), precision=hi,
                    preferred_element_type=jnp.float32)
    power = re * re + im * im                                  # [B,F,257]

    mel = jnp.matmul(power, jnp.asarray(kaldi_mel_filters()),
                     precision=hi,
                     preferred_element_type=jnp.float32)        # [B,F,80]
    logmel = jnp.log(jnp.maximum(mel, MEL_FLOOR))

    # Masked per-utterance per-mel-bin normalization (ddof=1).
    valid_frames = _num_frames(lengths)                         # [B]
    frame_mask = (jnp.arange(n_full)[None, :]
                  < valid_frames[:, None])                      # [B,F]
    fm = frame_mask[..., None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(fm, axis=1), 1.0)                   # [B,1]
    mean = jnp.sum(logmel * fm, axis=1, keepdims=True) / n[:, None]
    centered = (logmel - mean) * fm
    var = jnp.sum(centered * centered, axis=1, keepdims=True) / \
        jnp.maximum(n[:, None] - 1.0, 1.0)
    feats = centered / jnp.sqrt(var + 1e-7)
    feats = feats * fm                                          # zero padding

    # Pad the frame axis to an even count (HF pad_to_multiple_of=2),
    # then stride-2 stack: [B, F, 80] -> [B, F//2, 160].
    if n_frames > n_full:
        feats = jnp.pad(feats, ((0, 0), (0, n_frames - n_full), (0, 0)))
        frame_mask = jnp.pad(frame_mask,
                             ((0, 0), (0, n_frames - n_full)))
    feats = feats.reshape(B, n_frames // STRIDE, NUM_MEL_BINS * STRIDE)
    out_mask = frame_mask[:, 1::STRIDE]
    return feats, out_mask


def log_mel_frontend_np(waveform: np.ndarray) -> np.ndarray:
    """Float64 single-utterance reference path (pre-normalization
    fbank), used by tests and host-side verification."""
    x = np.asarray(waveform, dtype=np.float64) * 32768.0
    n = 1 + (len(x) - FRAME_LENGTH) // HOP_LENGTH
    window = povey_window(FRAME_LENGTH)
    bank = kaldi_mel_filters().astype(np.float64)
    out = np.empty((n, NUM_MEL_BINS))
    for f in range(n):
        fr = x[f * HOP_LENGTH: f * HOP_LENGTH + FRAME_LENGTH].copy()
        fr -= fr.mean()
        fr[1:] -= PREEMPHASIS * fr[:-1].copy()
        fr[0] *= 1 - PREEMPHASIS
        fr *= window
        spec = np.fft.rfft(fr, FFT_LENGTH)
        power = np.abs(spec) ** 2
        out[f] = np.log(np.maximum(power @ bank, MEL_FLOOR))
    return out
