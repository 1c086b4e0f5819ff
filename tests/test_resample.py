import numpy as np
import pytest

from audio_processor_tpu.dsp.resample import (
    resample, resample_np, resampled_length, sinc_resample_kernel,
)


def _tone(sr, dur, freq, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_resampled_length():
    assert resampled_length(8000, 8000, 16000) == 16000
    assert resampled_length(44100, 44100, 16000) == 16000
    assert resampled_length(12345, 48000, 16000) == 4115


def test_identity_when_rates_equal():
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    y = resample(x, 16000, 16000)
    np.testing.assert_array_equal(np.asarray(y), x)


@pytest.mark.parametrize("orig,new", [(8000, 16000), (48000, 16000),
                                      (44100, 16000), (22050, 16000)])
def test_jax_matches_numpy_reference(orig, new):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(orig).astype(np.float32)  # 1 second
    y_jax = np.asarray(resample(x, orig, new))
    y_np = resample_np(x, orig, new)
    assert y_jax.shape == y_np.shape == (resampled_length(len(x), orig, new),)
    np.testing.assert_allclose(y_jax, y_np, atol=2e-5)


def test_batched_shapes():
    x = np.zeros((2, 3, 8000), np.float32)
    y = np.asarray(resample(x, 8000, 16000))
    assert y.shape == (2, 3, 16000)


@pytest.mark.parametrize("orig", [8000, 44100, 48000])
def test_tone_preserved(orig):
    """A 440 Hz tone must survive resampling to 16 kHz with the right
    frequency and amplitude."""
    x = _tone(orig, 1.0, 440.0)
    y = np.asarray(resample(x, orig, 16000))
    assert y.shape[0] == 16000
    # Skip filter edges.
    core = y[800:-800]
    spec = np.abs(np.fft.rfft(core * np.hanning(len(core))))
    peak_hz = np.argmax(spec) * 16000 / len(core)
    assert abs(peak_hz - 440.0) < 5.0
    assert abs(core.max() - 0.5) < 0.02


def test_downsample_removes_aliasing():
    """Content above the new Nyquist must be attenuated, not aliased."""
    x = _tone(48000, 1.0, 10000.0)  # 10 kHz > 8 kHz Nyquist of 16 kHz
    y = np.asarray(resample(x, 48000, 16000))
    assert np.abs(y[800:-800]).max() < 0.05


def test_kernel_cache_and_shapes():
    k, width, og, ng = sinc_resample_kernel(48000, 16000)
    assert og == 3 and ng == 1
    assert k.shape == (ng, 2 * width + og)
    k2 = sinc_resample_kernel(48000, 16000)[0]
    assert k2 is k  # lru_cache hit
