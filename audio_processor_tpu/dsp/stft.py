"""Framing and matmul-DFT building blocks.

TPU-first design note: XLA's FFT on TPU is fine, but for short frames
(n_fft 512) feeding a mel projection, expressing the DFT as two real
matmuls keeps the whole frontend on the MXU and lets XLA fuse
window/power/mel into the surrounding program. Frame counts and
lengths are static per length-bucket, so everything compiles once.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hann_window(length: int, periodic: bool = True) -> np.ndarray:
    """Hann window; ``periodic=True`` matches ``torch.hann_window``."""
    n = length + 1 if periodic else length
    if n <= 1:
        return np.ones(length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return w[:length] if periodic else w


def povey_window(length: int) -> np.ndarray:
    """Kaldi's Povey window: symmetric hann ** 0.85."""
    return hann_window(length, periodic=False) ** 0.85


@functools.lru_cache(maxsize=16)
def dft_matrices(frame_length: int, fft_length: int,
                 dtype=np.float32) -> tuple:
    """(cos, -sin) matrices of shape [frame_length, fft_length//2+1].

    ``X[k] = sum_n x[n] * exp(-2πi k n / fft_length)`` for a frame that
    is zero-padded from frame_length to fft_length — the zero tail
    contributes nothing, so the matmul only covers the frame.
    """
    n = np.arange(frame_length)[:, None]
    k = np.arange(fft_length // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / float(fft_length)
    return (np.cos(ang).astype(dtype), (-np.sin(ang)).astype(dtype))


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int,
                 num_frames: int) -> jnp.ndarray:
    """[..., T] -> [..., num_frames, frame_length] via overlapping gather.

    ``num_frames`` must be static (pre-computed from the bucket length).
    """
    starts = jnp.arange(num_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def power_spectrum(frames: jnp.ndarray, fft_length: int) -> jnp.ndarray:
    """[..., F, frame_length] -> [..., F, fft_length//2+1] power via MXU.

    Precision HIGHEST: on TPU the default matmul precision is bf16,
    which costs ~1% relative error in the power spectrum — visible in
    log-mel values. Full-fp32 passes keep the frontend bit-faithful and
    are a negligible share of the pipeline's FLOPs.
    """
    import jax

    cos_m, msin_m = dft_matrices(frames.shape[-1], fft_length)
    re = jnp.matmul(frames, jnp.asarray(cos_m),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, jnp.asarray(msin_m),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return re * re + im * im


def magnitude_spectrum(frames: jnp.ndarray, fft_length: int) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(power_spectrum(frames, fft_length), 0.0))


def num_frames_nocenter(length, frame_length: int, hop: int):
    """Frame count for center=False framing (works on ints or arrays)."""
    if isinstance(length, (int, np.integer)):
        return max(0, 1 + (length - frame_length) // hop)
    return jnp.maximum(0, 1 + (length - frame_length) // hop)


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect padding on the last axis (torch.stft center=True style)."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
