"""pygame/SDL decode oracle shared by the WAV-ADPCM and MP3 tests."""

import os

import numpy as np


def sdl_decode(path, sr: int, ch: int):
    """Decode an audio file through pygame's SDL loader -> [ch, N]
    int16, or None when SDL can't init/decode (callers skip)."""
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    try:
        import pygame
        import pygame.sndarray as sa

        pygame.mixer.init(frequency=sr, size=-16, channels=ch)
    except Exception:
        return None
    try:
        arr = sa.array(pygame.mixer.Sound(file=str(path)))
    except Exception:
        return None
    finally:
        pygame.mixer.quit()
    if arr.ndim == 1:
        arr = arr[:, None]
    return np.ascontiguousarray(arr.T)
