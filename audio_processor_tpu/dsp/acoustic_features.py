"""Batched acoustic feature extraction for sentiment (device-side).

Reproduces the reference's 38-value feature dict (insertion order ==
feature-vector order) computed per speaker chunk
(reference: services/sentiment_analysis.py:807-894):

  rms_mean, rms_std, rms_range, zcr_mean, zcr_std,
  spectral_centroid_mean/std, spectral_bandwidth_mean/std,
  spectral_rolloff_mean/std, tempo,
  mfcc_{0..12}_mean, mfcc_{0..12}_std (interleaved mean/std)

with torch semantics preserved: unbiased std (ddof=1, NaN for a single
frame), 25 ms/10 ms unfold framing for RMS/ZCR, center=True reflect-pad
STFT (n_fft 512, hann-400 window centered in the FFT buffer),
torchaudio MFCC defaults (see dsp/mfcc.py), and the reference's
spectral-flux autocorrelation "tempo" — including its quirk that the
autocorrelation argmax is taken over the full correlation array
(sentiment_analysis.py:869-875), which is business behavior we keep.

TPU-first: one jitted program per length bucket processes the whole
batch of chunks; the reference loops waveforms serially in Python
(its second hot spot, SURVEY.md §3.2). Reflect padding is applied on
the host (dynamic per-sequence edges inside a static buffer), so the
device function is purely static-shaped.

Audio shorter than one frame yields all-zero features
(reference: sentiment_analysis.py:820-821, 896-913).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.dsp.mfcc import centered_window, mfcc_from_power_frames
from audio_processor_tpu.dsp.stft import dft_matrices, frame_signal

FRAME_LENGTH = 400
HOP = 160
N_FFT = 512
PAD = N_FFT // 2          # torch.stft center padding
N_MFCC = 13
NUM_FEATURES = 12 + 2 * N_MFCC  # 38


def prepare_reflect_padded(waves: List[np.ndarray], bucket_len: int
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side prep: place each mono waveform, reflect-padded by
    PAD samples on both sides, into a static [B, bucket_len + 2*PAD]
    buffer. Returns (buffer, lengths)."""
    B = len(waves)
    buf = np.zeros((B, bucket_len + 2 * PAD), dtype=np.float32)
    lengths = np.zeros((B,), dtype=np.int32)
    for i, w in enumerate(waves):
        w = np.asarray(w, dtype=np.float32).reshape(-1)[:bucket_len]
        n = w.shape[0]
        lengths[i] = n
        if n == 0:
            continue
        buf[i, PAD:PAD + n] = w
        left = min(PAD, n - 1)
        if left > 0:
            buf[i, PAD - left:PAD] = w[1:left + 1][::-1]
        right = min(PAD, n - 1)
        if right > 0:
            buf[i, PAD + n:PAD + n + right] = w[n - right - 1:n - 1][::-1]
    return buf, lengths


def _masked_mean_std(x: jnp.ndarray, mask: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/std over axis -1 with ddof=1 (torch semantics: std of a
    single element is NaN, which downstream gating relies on)."""
    m = mask.astype(jnp.float32)
    n = jnp.sum(m, axis=-1)
    mean = jnp.sum(x * m, axis=-1) / jnp.maximum(n, 1.0)
    d = (x - mean[..., None]) * m
    var = jnp.sum(d * d, axis=-1) / (n - 1.0)   # NaN/Inf when n == 1
    return mean, jnp.sqrt(var)


@jax.jit
def extract_features_batch(padded: jnp.ndarray, lengths: jnp.ndarray,
                           ) -> jnp.ndarray:
    """[B, bucket+2*PAD] reflect-padded audio -> [B, 38] features.

    ``lengths`` are the original (unpadded) sample counts; sample rate
    is fixed at 16 kHz (the pipeline's target rate).
    """
    sr = 16000.0
    B, Tbuf = padded.shape
    Tbuck = Tbuf - 2 * PAD
    x = padded.astype(jnp.float32)
    core = x[:, PAD:PAD + Tbuck]

    # ---- unfold framing (no padding) for RMS / ZCR --------------------
    nf_max = max(0, 1 + (Tbuck - FRAME_LENGTH) // HOP)
    frames = frame_signal(core, FRAME_LENGTH, HOP, nf_max)     # [B,F,400]
    nf_valid = jnp.maximum(0, 1 + (lengths - FRAME_LENGTH) // HOP)
    fmask = jnp.arange(nf_max)[None, :] < nf_valid[:, None]

    rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1))         # [B,F]
    rms_mean, rms_std = _masked_mean_std(rms, fmask)
    big = jnp.float32(3.4e38)
    rms_max = jnp.max(jnp.where(fmask, rms, -big), axis=-1)
    rms_min = jnp.min(jnp.where(fmask, rms, big), axis=-1)
    rms_rng = rms_max - rms_min

    signs = jnp.sign(frames)
    zc = jnp.sum((signs[..., :-1] * signs[..., 1:]) < 0,
                 axis=-1).astype(jnp.float32) / FRAME_LENGTH
    zcr_mean, zcr_std = _masked_mean_std(zc, fmask)

    # ---- STFT (center=True semantics via host reflect pad) ------------
    nf2_max = Tbuck // HOP + 1
    sframes = frame_signal(x, N_FFT, HOP, nf2_max)             # [B,F2,512]
    win = jnp.asarray(centered_window(FRAME_LENGTH, N_FFT),
                      dtype=jnp.float32)
    sframes = sframes * win
    hi = jax.lax.Precision.HIGHEST
    cos_m, msin_m = dft_matrices(N_FFT, N_FFT)
    re = jnp.matmul(sframes, jnp.asarray(cos_m), precision=hi,
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(sframes, jnp.asarray(msin_m), precision=hi,
                    preferred_element_type=jnp.float32)
    power = re * re + im * im                                  # [B,F2,257]

    nf2_valid = lengths // HOP + 1
    smask = jnp.arange(nf2_max)[None, :] < nf2_valid[:, None]  # [B,F2]
    mag = jnp.sqrt(jnp.maximum(power, 0.0)) * smask[..., None]

    freqs = jnp.linspace(0.0, sr / 2.0, N_FFT // 2 + 1)        # [257]
    energy = jnp.sum(mag, axis=-1) + 1e-8                      # [B,F2]

    centroid = jnp.sum(mag * freqs, axis=-1) / energy
    sc_mean, sc_std = _masked_mean_std(centroid, smask)

    diff_sq = (freqs[None, None, :] - centroid[..., None]) ** 2
    bandwidth = jnp.sqrt(jnp.sum(mag * diff_sq, axis=-1) / energy)
    sb_mean, sb_std = _masked_mean_std(bandwidth, smask)

    cum = jnp.cumsum(mag, axis=-1)
    thresh = 0.85 * (cum[..., -1] + 1e-8)
    roll_idx = jnp.argmax(cum >= thresh[..., None], axis=-1)
    roll_freqs = freqs[roll_idx]
    sr_mean, sr_std = _masked_mean_std(roll_freqs, smask)

    # ---- MFCC ----------------------------------------------------------
    mfcc = mfcc_from_power_frames(power, N_MFCC)               # [B,F2,13]
    mf_mean, mf_std = _masked_mean_std(
        jnp.swapaxes(mfcc, 1, 2), smask[:, None, :])           # [B,13]

    # ---- tempo via spectral-flux autocorrelation ----------------------
    flux = jnp.sum(jax.nn.relu(mag[:, 1:, :] - mag[:, :-1, :]),
                   axis=-1)                                    # [B,L]
    L = nf2_max - 1
    # Per-sequence full cross-correlation via grouped conv.
    xs = flux[None, :, :]                                      # [1,B,L]
    ws = flux[:, None, :]                                      # [B,1,L]
    corr = jax.lax.conv_general_dilated(
        xs, ws, window_strides=(1,), padding=((L - 1, L - 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=B, precision=hi)[0]                # [B,2L-1]
    L_valid = nf2_valid - 1
    # The reference zeroes its index 0 == lag -(L_valid-1); replicate
    # at the static-array position (L-1) - (L_valid-1).
    zero_pos = (L - 1) - (L_valid - 1)
    corr = corr * (jnp.arange(2 * L - 1)[None, :] !=
                   zero_pos[:, None]).astype(corr.dtype)
    max_val = jnp.max(corr, axis=-1)
    arg = jnp.argmax(corr, axis=-1)
    ref_idx = arg - (L - 1) + (L_valid - 1)     # index in reference array
    period = jnp.where((max_val > 0) & (ref_idx > 0),
                       ref_idx.astype(jnp.float32) * HOP / sr, 0.0)
    tempo = jnp.where(period > 0, 60.0 / jnp.maximum(period, 1e-12), 0.0)

    feats = jnp.stack([
        rms_mean, rms_std, rms_rng, zcr_mean, zcr_std,
        sc_mean, sc_std, sb_mean, sb_std, sr_mean, sr_std, tempo,
    ], axis=-1)                                                # [B,12]
    mf = jnp.stack([mf_mean, mf_std], axis=-1).reshape(B, 2 * N_MFCC)
    feats = jnp.concatenate([feats, mf], axis=-1)              # [B,38]

    # Audio shorter than one frame -> all-zero features.
    ok = (lengths >= FRAME_LENGTH)[:, None]
    return jnp.where(ok, feats, 0.0)


FEATURE_NAMES = (
    ["rms_mean", "rms_std", "rms_range", "zcr_mean", "zcr_std",
     "spectral_centroid_mean", "spectral_centroid_std",
     "spectral_bandwidth_mean", "spectral_bandwidth_std",
     "spectral_rolloff_mean", "spectral_rolloff_std", "tempo"]
    + [x for i in range(N_MFCC) for x in (f"mfcc_{i}_mean", f"mfcc_{i}_std")]
)
