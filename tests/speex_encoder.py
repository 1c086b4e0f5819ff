"""Test-fixture Ogg/Speex encoder: libspeex encoder (ctypes) + the
first-party Ogg page muxer from tests/vorbis_encoder.py.

Produces real Ogg-Speex streams (80-byte SpeexHeader built by
libspeex's own ``speex_init_header``, a Vorbis-style comment packet,
and audio pages with sample granule positions) so the decoder under
test (audio_processor_tpu/io/speex.py) is validated against an
independent framing implementation, not against itself.
"""

from __future__ import annotations

import ctypes

import numpy as np

from audio_processor_tpu.io.speex import (
    SPEEX_GET_FRAME_SIZE,
    SPEEX_SET_COMPLEXITY,
    SPEEX_SET_QUALITY,
    SPEEX_SET_SAMPLING_RATE,
    SpeexBits,
    _libspeex,
)
from tests.vorbis_encoder import ogg_page


class _SpeexHeaderStruct(ctypes.Structure):
    """speex_header.h struct SpeexHeader (80 bytes, packed ints)."""

    _fields_ = [
        ("speex_string", ctypes.c_char * 8),
        ("speex_version", ctypes.c_char * 20),
        ("speex_version_id", ctypes.c_int32),
        ("header_size", ctypes.c_int32),
        ("rate", ctypes.c_int32),
        ("mode", ctypes.c_int32),
        ("mode_bitstream_version", ctypes.c_int32),
        ("nb_channels", ctypes.c_int32),
        ("bitrate", ctypes.c_int32),
        ("frame_size", ctypes.c_int32),
        ("vbr", ctypes.c_int32),
        ("frames_per_packet", ctypes.c_int32),
        ("extra_headers", ctypes.c_int32),
        ("reserved1", ctypes.c_int32),
        ("reserved2", ctypes.c_int32),
    ]


def encoder_available() -> bool:
    return _libspeex() is not None


def comment_packet(vendor: bytes = b"test-fixture") -> bytes:
    return len(vendor).to_bytes(4, "little") + vendor + \
        (0).to_bytes(4, "little")


def encode_ogg_speex(pcm: np.ndarray, rate: int, mode: int = 0,
                     frames_per_packet: int = 1, quality: int = 8,
                     serial: int = 0x5EEC) -> tuple:
    """Encode float32 [C, N] (C in {1, 2}) -> (ogg_bytes, packets).

    ``packets`` is the raw audio packet list so tests can also decode
    them directly through libspeex and assert our Ogg path is
    bit-exact against packet-by-packet decode.
    """
    lib = _libspeex()
    assert lib is not None
    channels, n = int(pcm.shape[0]), int(pcm.shape[1])
    st = lib.speex_encoder_init(
        ctypes.c_void_p(lib.speex_lib_get_mode(mode)))
    assert st
    try:
        q = ctypes.c_int(quality)
        lib.speex_encoder_ctl(ctypes.c_void_p(st), SPEEX_SET_QUALITY,
                              ctypes.byref(q))
        cx = ctypes.c_int(3)
        lib.speex_encoder_ctl(ctypes.c_void_p(st), SPEEX_SET_COMPLEXITY,
                              ctypes.byref(cx))
        r = ctypes.c_int(rate)
        lib.speex_encoder_ctl(ctypes.c_void_p(st),
                              SPEEX_SET_SAMPLING_RATE, ctypes.byref(r))
        fs = ctypes.c_int(0)
        lib.speex_encoder_ctl(ctypes.c_void_p(st), SPEEX_GET_FRAME_SIZE,
                              ctypes.byref(fs))
        frame = fs.value

        header = _SpeexHeaderStruct()
        lib.speex_init_header(ctypes.byref(header), rate, 1,
                              ctypes.c_void_p(
                                  lib.speex_lib_get_mode(mode)))
        header.nb_channels = channels
        header.frames_per_packet = frames_per_packet
        header.vbr = 0
        head_pkt = bytes(bytearray(header)[:80])

        x = (np.clip(pcm, -1.0, 1.0) * 32767.0).astype(np.int16)
        pad = (-n) % (frame * frames_per_packet)
        if pad:
            x = np.concatenate([x, np.zeros((channels, pad), np.int16)],
                               axis=1)
        inter = np.ascontiguousarray(x.T.reshape(-1))

        bits = SpeexBits()
        lib.speex_bits_init(ctypes.byref(bits))
        out = ctypes.create_string_buffer(4000)
        packets = []
        granules = []
        buf = (ctypes.c_int16 * (frame * channels))()
        try:
            total_frames = x.shape[1] // frame
            f = 0
            while f < total_frames:
                lib.speex_bits_reset(ctypes.byref(bits))
                for _ in range(frames_per_packet):
                    seg = inter[f * frame * channels:
                                (f + 1) * frame * channels]
                    ctypes.memmove(buf, seg.tobytes(), seg.nbytes)
                    if channels == 2:
                        lib.speex_encode_stereo_int(
                            buf, frame, ctypes.byref(bits))
                    lib.speex_encode_int(ctypes.c_void_p(st), buf,
                                         ctypes.byref(bits))
                    f += 1
                lib.speex_bits_insert_terminator(ctypes.byref(bits))
                nb = lib.speex_bits_write(ctypes.byref(bits), out,
                                          len(out))
                packets.append(out.raw[:nb])
                granules.append(f * frame)
        finally:
            lib.speex_bits_destroy(ctypes.byref(bits))
    finally:
        lib.speex_encoder_destroy(ctypes.c_void_p(st))

    pages = [ogg_page([head_pkt], serial, 0, 0, 0x2),
             ogg_page([comment_packet()], serial, 1, 0, 0x0)]
    seq = 2
    group_n = 3                      # a few packets per page
    for i in range(0, len(packets), group_n):
        group = packets[i:i + group_n]
        granule = granules[min(i + group_n, len(packets)) - 1]
        last = i + group_n >= len(packets)
        pages.append(ogg_page(group, serial, seq, granule,
                              0x4 if last else 0x0))
        seq += 1
    return b"".join(pages), packets
