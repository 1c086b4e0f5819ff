"""Test-fixture Ogg/Opus encoder: libopus encoder (ctypes) + the
first-party Ogg page muxer from tests/vorbis_encoder.py.

Produces real RFC 7845 streams (OpusHead/OpusTags + audio pages with
correct granule positions and pre-skip) so the decoder under test
(audio_processor_tpu/io/opus.py) is validated against an independent
encoder implementation, not against itself.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
from typing import List

import numpy as np

from tests.vorbis_encoder import ogg_page

_SR = 48000
_FRAME = 960  # 20 ms at 48 kHz

_OPUS_APPLICATION_AUDIO = 2049
_OPUS_SET_BITRATE = 4002
_OPUS_GET_LOOKAHEAD = 4027


def _load():
    name = ctypes.util.find_library("opus")
    if not name:
        return None
    lib = ctypes.CDLL(name)
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.opus_encoder_destroy.argtypes = [ctypes.c_void_p]
    lib.opus_encode_float.restype = ctypes.c_int32
    lib.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int32]
    return lib


def encoder_available() -> bool:
    return _load() is not None


def opus_head(channels: int, pre_skip: int,
              input_rate: int = _SR, gain_q8: int = 0) -> bytes:
    return (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIh", pre_skip, input_rate, gain_q8)
            + bytes([0]))  # mapping family 0


def opus_tags(vendor: bytes = b"test-fixture") -> bytes:
    return (b"OpusTags" + struct.pack("<I", len(vendor)) + vendor
            + struct.pack("<I", 0))


def encode_ogg_opus(pcm: np.ndarray, channels: int,
                    bitrate: int = 96000,
                    packets_per_page: int = 25,
                    gain_q8: int = 0) -> bytes:
    """[N, channels] float32 at 48 kHz -> complete Ogg/Opus bytes."""
    lib = _load()
    assert lib is not None, "libopus unavailable"
    pcm = np.asarray(pcm, np.float32).reshape(-1, channels)
    n_in = pcm.shape[0]

    err = ctypes.c_int(0)
    enc = lib.opus_encoder_create(_SR, channels,
                                  _OPUS_APPLICATION_AUDIO,
                                  ctypes.byref(err))
    assert enc and err.value == 0, f"encoder create err={err.value}"
    enc = ctypes.c_void_p(enc)  # keep 64-bit width through variadic ctl
    try:
        lib.opus_encoder_ctl(enc, ctypes.c_int(_OPUS_SET_BITRATE),
                             ctypes.c_int32(bitrate))
        look = ctypes.c_int32(0)
        lib.opus_encoder_ctl(enc, ctypes.c_int(_OPUS_GET_LOOKAHEAD),
                             ctypes.byref(look))
        pre_skip = int(look.value)

        # Pad to whole frames plus one tail frame to flush the lookahead.
        frames = -(-(n_in + pre_skip) // _FRAME)
        padded = np.zeros((frames * _FRAME, channels), np.float32)
        padded[:n_in] = pcm
        out = ctypes.create_string_buffer(4000)
        packets: List[bytes] = []
        for i in range(frames):
            fr = np.ascontiguousarray(padded[i * _FRAME:(i + 1) * _FRAME])
            nb = lib.opus_encode_float(
                enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                _FRAME, out, len(out))
            assert nb > 0, f"opus_encode_float err={nb}"
            packets.append(out.raw[:nb])
    finally:
        lib.opus_encoder_destroy(enc)

    serial = 0x4F505553
    pages = [ogg_page([opus_head(channels, pre_skip, gain_q8=gain_q8)],
                      serial, 0, 0, 0x2),
             ogg_page([opus_tags()], serial, 1, 0, 0x0)]
    seq = 2
    done = 0  # samples (incl. pre-skip) completed so far
    for i in range(0, len(packets), packets_per_page):
        group = packets[i:i + packets_per_page]
        done += _FRAME * len(group)
        last = i + len(group) == len(packets)
        # Final page granule = pre_skip + original sample count, which
        # trims the encoder padding on decode (RFC 7845 §4).
        granule = (pre_skip + n_in) if last else done
        pages.append(ogg_page(group, serial, seq, granule,
                              0x4 if last else 0x0))
        seq += 1
    return b"".join(pages)
