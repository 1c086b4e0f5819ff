"""MP3 (MPEG-1/2/2.5 Layer III) ingest via the system libmpg123.

BEYOND-REFERENCE, optional: the reference scans only *.wav and *.ogg
(pipeline.py:64-65) — .mp3 support is an ingest convenience for
archives that were transcoded. Decode goes through libmpg123 (the
decoder behind mpg123/ffmpeg's fallback and SDL_mixer) driven by
ctypes with the feeder API — in-process, no subprocess, no temp
files. There is deliberately NO first-party fallback: unlike WAV/
Vorbis/Opus/GSM (formats the reference pipeline must decode), MP3 is
out of the reference's contract, so an absent libmpg123 raises a
clean, actionable error instead of shipping 2,000 lines of Layer III
outside the parity surface.

``probe_mp3`` walks frame headers (ID3v2 skip, free-format rejected)
so the scanner can reject mono files and report duration without
decoding audio.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

_MPG123_ADD_FLAGS = 2
_MPG123_FORCE_FLOAT = 0x400
_MPG123_GAPLESS = 0x40
_MPG123_OK = 0
_MPG123_NEED_MORE = -10
_MPG123_NEW_FORMAT = -11
_MPG123_DONE = -12

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _libmpg123() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if not _lib_tried:
        _lib_tried = True
        for name in ("libmpg123.so.0", "libmpg123.so", "mpg123"):
            try:
                lib = ctypes.CDLL(name)
                lib.mpg123_init()
                lib.mpg123_new.restype = ctypes.c_void_p
                _lib = lib
                break
            except OSError:
                continue
    return _lib


def mpg123_available() -> bool:
    return _libmpg123() is not None


def decode_mp3(data: bytes) -> Tuple[np.ndarray, int]:
    """MP3 bytes -> ([C, N] float32 in [-1, 1], sample_rate)."""
    lib = _libmpg123()
    if lib is None:
        raise RuntimeError(
            "MP3 decode needs the system libmpg123 (apt install "
            "libmpg123-0); .mp3 ingest is an optional beyond-reference "
            "path with no first-party fallback")
    err = ctypes.c_int(0)
    h = lib.mpg123_new(None, ctypes.byref(err))
    if not h:
        raise RuntimeError(f"mpg123_new failed ({err.value})")
    try:
        lib.mpg123_param(ctypes.c_void_p(h), _MPG123_ADD_FLAGS,
                         ctypes.c_long(_MPG123_FORCE_FLOAT
                                       | _MPG123_GAPLESS),
                         ctypes.c_double(0))
        if lib.mpg123_open_feed(ctypes.c_void_p(h)) != 0:
            raise RuntimeError("mpg123_open_feed failed")
        if lib.mpg123_feed(ctypes.c_void_p(h), data, len(data)) != 0:
            raise ValueError("mpg123 rejected the stream")
        rate = ctypes.c_long(0)
        ch = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        out = ctypes.create_string_buffer(1 << 18)
        done = ctypes.c_size_t(0)
        chunks = []
        while True:
            rc = lib.mpg123_read(ctypes.c_void_p(h), out, len(out),
                                 ctypes.byref(done))
            if done.value:
                chunks.append(out.raw[:done.value])
            if rc == _MPG123_NEW_FORMAT:
                lib.mpg123_getformat(ctypes.c_void_p(h),
                                     ctypes.byref(rate),
                                     ctypes.byref(ch),
                                     ctypes.byref(enc))
            elif rc in (_MPG123_NEED_MORE, _MPG123_DONE):
                break
            elif rc != _MPG123_OK:
                raise ValueError(f"mpg123 decode error rc={rc}")
        if not chunks or ch.value <= 0 or rate.value <= 0:
            raise ValueError("no MP3 audio decoded")
        flat = np.frombuffer(b"".join(chunks), "<f4")
        flat = flat[:len(flat) - len(flat) % ch.value]
        x = np.ascontiguousarray(flat.reshape(-1, ch.value).T)
        if not np.isfinite(x).all():      # same policy as float WAV
            x = np.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
        return x, int(rate.value)
    finally:
        lib.mpg123_delete(ctypes.c_void_p(h))


# --- header-walk probe (no audio decode) ---------------------------------

_RATES = {
    # (version_bits) -> rate table; version: 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}
_BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320)
_BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                   144, 160)


@dataclass(frozen=True)
class Mp3Info:
    sample_rate: int
    num_frames: int          # PCM frames (samples per channel)
    num_channels: int
    num_mp3_frames: int


def probe_mp3(data: bytes) -> Mp3Info:
    """Walk Layer III frame headers for (rate, channels, duration).

    Counts granule-accurate PCM samples (1152 per frame for MPEG-1,
    576 for MPEG-2/2.5); does not subtract the encoder delay/padding
    (unknown without decoding the LAME tag) — durations are within
    ~2 frames, which the scanner's duration gates tolerate.
    """
    pos = 0
    n = len(data)
    if n >= 10 and data[:3] == b"ID3":
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
               ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + size
    frames = 0
    samples = 0
    rate = channels = 0
    while pos + 4 <= n:
        b0, b1, b2, b3 = data[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            pos += 1
            continue
        version = (b1 >> 3) & 0x3          # 3=MPEG1 2=MPEG2 0=MPEG2.5
        layer = (b1 >> 1) & 0x3            # 1 = Layer III
        if version == 1 or layer != 1:
            pos += 1
            continue
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            pos += 1                       # free-format/bad: resync
            continue
        sr = _RATES[version][sr_idx]
        kbps = (_BITRATES_V1_L3 if version == 3
                else _BITRATES_V2_L3)[br_idx]
        padding = (b2 >> 1) & 0x1
        spf = 1152 if version == 3 else 576
        frame_len = spf // 8 * kbps * 1000 // sr + padding
        if frame_len <= 4 or pos + frame_len > n:
            break
        mode = (b3 >> 6) & 0x3             # 3 = mono
        if rate == 0:
            rate = sr
            channels = 1 if mode == 3 else 2
        frames += 1
        samples += spf
        pos += frame_len
    if frames == 0 or rate == 0:
        raise ValueError("no MP3 frames found")
    return Mp3Info(rate, samples, channels, frames)


def looks_like_mp3(data: bytes) -> bool:
    """Container sniff for serving bodies: ID3v2 tag or a Layer III
    sync at the head."""
    if len(data) >= 3 and data[:3] == b"ID3":
        return True
    if len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        return (data[1] >> 1) & 0x3 == 1   # layer III
    return False
