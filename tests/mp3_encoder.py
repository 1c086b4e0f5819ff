"""MP3 test-fixture encoder: the system libmp3lame via ctypes.

Real-encoder fixtures for io/mp3.py's libmpg123 decode path (the
reference never touches MP3 — pipeline.py:64-65 scans .wav/.ogg only —
so this is beyond-reference ingest coverage). The LAME/Xing tag
placeholder frame is patched after flush (lame_get_lametag_frame) so
gapless/duration metadata is real, like any file LAME itself writes.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _lame() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        _tried = True
        for name in ("libmp3lame.so.0", "libmp3lame.so", "mp3lame"):
            try:
                lib = ctypes.CDLL(name)
                lib.lame_init.restype = ctypes.c_void_p
                _lib = lib
                break
            except OSError:
                continue
    return _lib


def encoder_available() -> bool:
    return _lame() is not None


def encode_mp3(pcm: np.ndarray, sample_rate: int,
               bitrate_kbps: int = 96, vbr: bool = False) -> bytes:
    """[N, C] float in [-1, 1] -> MP3 bytes (C in {1, 2})."""
    lib = _lame()
    assert lib is not None, "libmp3lame unavailable"
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    assert ch in (1, 2)
    gf = lib.lame_init()
    try:
        lib.lame_set_in_samplerate(ctypes.c_void_p(gf), sample_rate)
        lib.lame_set_out_samplerate(ctypes.c_void_p(gf), sample_rate)
        lib.lame_set_num_channels(ctypes.c_void_p(gf), ch)
        if ch == 1:
            lib.lame_set_mode(ctypes.c_void_p(gf), 3)   # MONO
        if vbr:
            lib.lame_set_VBR(ctypes.c_void_p(gf), 4)    # vbr_default
            lib.lame_set_VBR_q(ctypes.c_void_p(gf), 4)
        else:
            lib.lame_set_brate(ctypes.c_void_p(gf), bitrate_kbps)
        assert lib.lame_init_params(ctypes.c_void_p(gf)) >= 0
        i16 = np.clip(np.round(pcm * 32767.0), -32768,
                      32767).astype("<i2")
        cap = int(1.25 * n + 7200)
        buf = ctypes.create_string_buffer(cap)
        if ch == 2:
            inter = np.ascontiguousarray(i16)
            nb = lib.lame_encode_buffer_interleaved(
                ctypes.c_void_p(gf),
                inter.ctypes.data_as(ctypes.c_void_p), n, buf, cap)
        else:
            mono = np.ascontiguousarray(i16[:, 0])
            nb = lib.lame_encode_buffer(
                ctypes.c_void_p(gf),
                mono.ctypes.data_as(ctypes.c_void_p),
                mono.ctypes.data_as(ctypes.c_void_p), n, buf, cap)
        assert nb >= 0, nb
        out = buf.raw[:nb]
        nb = lib.lame_encode_flush(ctypes.c_void_p(gf), buf, cap)
        assert nb >= 0
        out += buf.raw[:nb]
        # patch the Xing/LAME placeholder frame written at stream head
        nb = lib.lame_get_lametag_frame(ctypes.c_void_p(gf), buf, cap)
        if 0 < nb <= len(out):
            out = buf.raw[:nb] + out[nb:]
        return out
    finally:
        lib.lame_close(ctypes.c_void_p(gf))
