"""Device tracing via jax.profiler (SURVEY.md §5.1).

Where the reference samples nvidia-smi at 1 Hz, TPU runs get real XLA
traces viewable in TensorBoard/Perfetto. Enable with
``enable_profiling: true`` + ``profile_dir`` in config, or wrap any
region with :func:`trace`.
"""

from __future__ import annotations

import contextlib
import logging
from pathlib import Path
from typing import Iterator

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(profile_dir: str | Path,
          create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    import jax

    Path(profile_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(profile_dir),
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", profile_dir)


@contextlib.contextmanager
def maybe_trace(config) -> Iterator[None]:
    """Trace when the config asks for it; no-op otherwise."""
    if config.get("enable_profiling", False):
        pdir = config.get("profile_dir", "") or str(
            Path(config.get("output_folder", ".")) / "profile")
        with trace(pdir):
            yield
    else:
        yield


def annotate(name: str):
    """Named region for traces (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
