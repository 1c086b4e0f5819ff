"""Device/system probes (reference: utils/utils.py:14-72).

GPU probes become JAX device probes; everything else is psutil.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def check_device_availability(device_index: int = 0) -> Tuple[bool, str]:
    """TPU/accelerator availability (replaces check_gpu_availability,
    utils/utils.py:14-26)."""
    try:
        import jax

        devices = jax.devices()
    except Exception as e:
        return False, f"No JAX backend available: {e}"
    if not devices:
        return False, "No devices available"
    if device_index >= len(devices):
        return False, (f"Device index {device_index} not available "
                       f"(only {len(devices)} devices found)")
    d = devices[device_index]
    if d.platform == "cpu":
        return False, f"No accelerator available - using {d}"
    return True, f"Device {device_index}: {d}"


def get_device_memory_usage(device_index: int = 0) -> Optional[float]:
    """Percent HBM used on one device (replaces get_gpu_memory_usage)."""
    try:
        import jax

        d = jax.devices()[device_index]
        stats = d.memory_stats() or {}
        used, limit = stats.get("bytes_in_use"), stats.get("bytes_limit")
        if used is None or not limit:
            return None
        return 100.0 * used / limit
    except Exception:
        return None


def get_system_stats() -> dict:
    """CPU/RAM/disk snapshot (reference: utils/utils.py:36-54)."""
    stats = {}
    try:
        import psutil

        stats["cpu_percent"] = psutil.cpu_percent(interval=0.1)
        vm = psutil.virtual_memory()
        stats["memory_percent"] = vm.percent
        stats["memory_available_gb"] = vm.available / 1024 ** 3
        stats["disk_free_gb"] = psutil.disk_usage("/").free / 1024 ** 3
    except ImportError:
        pass
    dev = get_device_memory_usage()
    if dev is not None:
        stats["device_memory_percent"] = dev
    return stats


def pad_chunk_waveforms(waveforms: List[np.ndarray]) -> np.ndarray:
    """Right-pad [C, T_i] waveforms to a dense stack (reference:
    utils/utils.py:56-72)."""
    if not waveforms:
        return np.empty((0,))
    max_len = max(w.shape[-1] for w in waveforms)
    out = []
    for w in waveforms:
        pad = max_len - w.shape[-1]
        if pad:
            w = np.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, pad)])
        out.append(w)
    return np.stack(out)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache (opt-out via
    APT_NO_COMPILATION_CACHE=1).

    On hosts where XLA compilation is remote/slow (this image's
    tunneled TPU compiles a toy scan in ~160 s cold vs ~14 s cached),
    the on-disk cache cuts every cold start — bench, CLI, serving —
    by ~10x after the first run. Call BEFORE the first jit compile;
    safe to call repeatedly."""
    import os

    if os.environ.get("APT_NO_COMPILATION_CACHE"):
        return ""
    try:
        cache_dir = cache_dir or os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "audio_processor_tpu", "xla"))
        os.makedirs(cache_dir, exist_ok=True)
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        return cache_dir
    except Exception as e:  # unwritable HOME etc. — never take the
        import logging       # pipeline down for an optimization

        logging.getLogger(__name__).warning(
            "compilation cache disabled: %s", e)
        return ""


# Reference-name aliases (utils/utils.py:14-34) so imports migrate
# drop-in; "gpu" reads as "accelerator device" on TPU.
check_gpu_availability = check_device_availability
get_gpu_memory_usage = get_device_memory_usage
