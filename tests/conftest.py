"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4.3). Must be set before
jax initializes its backends.
"""

import os

# Force CPU even if the environment pins a TPU platform. NOTE: a
# sitecustomize.py in this image re-exports JAX_PLATFORMS=axon at
# interpreter startup, clobbering inherited env vars — the only
# reliable override is jax.config.update before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Build the native fast-path library once per checkout when missing
# (gitignored build artifact) — 16 tests otherwise skip with "native
# lib not built". ~30 s one-time vs the ~6 min suite. Opt out with
# APT_SKIP_NATIVE_BUILD=1; on any failure the tests skip gracefully.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_native_so = os.path.join(_repo_root, "audio_processor_tpu", "io",
                          "_native", "libaudioio.so")
if (not os.path.exists(_native_so)
        and os.environ.get("APT_SKIP_NATIVE_BUILD") != "1"):
    import subprocess
    try:
        subprocess.run(
            ["bash", os.path.join(_repo_root, "native", "build.sh")],
            check=False, capture_output=True, timeout=600)
    except Exception:
        pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_tone(sr: int, dur: float, freq: float = 440.0, amp: float = 0.3):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def make_stereo_call(sr: int = 16000, dur: float = 10.0):
    """Synthetic 2-channel agent/client call: alternating tone bursts."""
    n = int(sr * dur)
    agent = np.zeros(n, dtype=np.float32)
    client = np.zeros(n, dtype=np.float32)
    burst = int(sr * 1.0)
    for i in range(0, n, 2 * burst):
        seg = make_tone(sr, 1.0, 220.0)[: max(0, min(burst, n - i))]
        agent[i:i + seg.shape[0]] = seg
        j = i + burst
        if j < n:
            seg2 = make_tone(sr, 1.0, 330.0)[: max(0, min(burst, n - j))]
            client[j:j + seg2.shape[0]] = seg2
    return np.stack([agent, client])


@pytest.fixture
def stereo_call():
    return make_stereo_call()
