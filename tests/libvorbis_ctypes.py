"""Real-world Vorbis encode/decode oracles via the system Xiph
libraries (libvorbisenc / libvorbisfile), driven through ctypes.

These are test-only helpers: the framework's own decoder
(io/vorbis.py + native/vorbis*.cpp) must agree with streams produced
by the actual reference encoder — the same libvorbis that ffmpeg's
libvorbis path uses, i.e. what the reference pipeline's ffmpeg decode
step consumes in production (reference:
services/audio_processor.py:76-86).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_c_long = ctypes.c_long
_i64 = ctypes.c_int64


class OggPacket(ctypes.Structure):
    _fields_ = [("packet", ctypes.POINTER(ctypes.c_ubyte)),
                ("bytes", _c_long), ("b_o_s", _c_long),
                ("e_o_s", _c_long), ("granulepos", _i64),
                ("packetno", _i64)]


class OggPage(ctypes.Structure):
    _fields_ = [("header", ctypes.POINTER(ctypes.c_ubyte)),
                ("header_len", _c_long),
                ("body", ctypes.POINTER(ctypes.c_ubyte)),
                ("body_len", _c_long)]


class VorbisInfo(ctypes.Structure):
    _fields_ = [("version", ctypes.c_int), ("channels", ctypes.c_int),
                ("rate", _c_long), ("bitrate_upper", _c_long),
                ("bitrate_nominal", _c_long), ("bitrate_lower", _c_long),
                ("bitrate_window", _c_long),
                ("codec_setup", ctypes.c_void_p)]


def _load(*names) -> Optional[ctypes.CDLL]:
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_ogg = _load("libogg.so.0", "libogg.so")
_vorbis = _load("libvorbis.so.0", "libvorbis.so")
_venc = _load("libvorbisenc.so.2", "libvorbisenc.so")
_vfile = _load("libvorbisfile.so.3", "libvorbisfile.so")


def available() -> bool:
    return all(x is not None for x in (_ogg, _vorbis, _venc, _vfile))


_OPAQUE = 1 << 16  # generous blob for vorbis_dsp_state / ogg_stream_state


def encode_vorbis(pcm: np.ndarray, sample_rate: int,
                  quality: float = 0.4) -> bytes:
    """[C, N] float32 in [-1, 1] -> Ogg Vorbis bytes via libvorbisenc
    (VBR mode; the encoder freely mixes long/short blocks and, for
    stereo, channel coupling — exactly the bitstreams a real-world
    file contains)."""
    assert available()
    pcm = np.asarray(pcm, np.float32)
    if pcm.ndim == 1:
        pcm = pcm[None]
    channels, n_total = pcm.shape

    vi = ctypes.create_string_buffer(_OPAQUE)
    vc = ctypes.create_string_buffer(_OPAQUE)
    vd = ctypes.create_string_buffer(_OPAQUE)
    vb = ctypes.create_string_buffer(_OPAQUE)
    os_ = ctypes.create_string_buffer(_OPAQUE)

    _vorbis.vorbis_info_init(vi)
    rc = _venc.vorbis_encode_init_vbr(
        vi, _c_long(channels), _c_long(sample_rate),
        ctypes.c_float(quality))
    assert rc == 0, f"vorbis_encode_init_vbr failed: {rc}"
    _vorbis.vorbis_comment_init(vc)
    assert _vorbis.vorbis_analysis_init(vd, vi) == 0
    assert _vorbis.vorbis_block_init(vd, vb) == 0
    assert _ogg.ogg_stream_init(os_, ctypes.c_int(12345)) == 0

    out = bytearray()
    page = OggPage()

    def pageout(flush: bool) -> None:
        fn = _ogg.ogg_stream_flush if flush else _ogg.ogg_stream_pageout
        while fn(os_, ctypes.byref(page)) != 0:
            out.extend(ctypes.string_at(page.header, page.header_len))
            out.extend(ctypes.string_at(page.body, page.body_len))

    h1, h2, h3 = OggPacket(), OggPacket(), OggPacket()
    assert _vorbis.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(h1), ctypes.byref(h2),
        ctypes.byref(h3)) == 0
    for h in (h1, h2, h3):
        _ogg.ogg_stream_packetin(os_, ctypes.byref(h))
    pageout(flush=True)  # audio data must start on a fresh page

    _vorbis.vorbis_analysis_buffer.restype = \
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
    op = OggPacket()
    CHUNK = 4096
    pos = 0
    while pos <= n_total:
        n = min(CHUNK, n_total - pos)
        if n > 0:
            buf = _vorbis.vorbis_analysis_buffer(vd, ctypes.c_int(n))
            for ch in range(channels):
                ctypes.memmove(
                    buf[ch],
                    pcm[ch, pos:pos + n].tobytes(), n * 4)
        _vorbis.vorbis_analysis_wrote(vd, ctypes.c_int(n))
        while _vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            _vorbis.vorbis_analysis(vb, None)
            _vorbis.vorbis_bitrate_addblock(vb)
            while _vorbis.vorbis_bitrate_flushpacket(
                    vd, ctypes.byref(op)) == 1:
                _ogg.ogg_stream_packetin(os_, ctypes.byref(op))
                pageout(flush=False)
        if n == 0:
            break
        pos += n
    pageout(flush=True)

    _ogg.ogg_stream_clear(os_)
    _vorbis.vorbis_block_clear(vb)
    _vorbis.vorbis_dsp_clear(vd)
    _vorbis.vorbis_comment_clear(vc)
    _vorbis.vorbis_info_clear(vi)
    return bytes(out)


def decode_vorbisfile(data) -> Tuple[np.ndarray, int]:
    """Ogg Vorbis bytes/path -> ([C, N] float32, sample_rate) via
    libvorbisfile's ov_read_float — the Xiph reference decoder."""
    assert available()
    if isinstance(data, (str, Path)):
        path = str(data)
        tmp = None
    else:
        tmp = tempfile.NamedTemporaryFile(suffix=".ogg", delete=False)
        tmp.write(data)
        tmp.flush()
        path = tmp.name
    vf = ctypes.create_string_buffer(_OPAQUE)
    try:
        rc = _vfile.ov_fopen(path.encode(), vf)
        assert rc == 0, f"ov_fopen failed: {rc}"
        _vfile.ov_info.restype = ctypes.POINTER(VorbisInfo)
        info = _vfile.ov_info(vf, ctypes.c_int(-1)).contents
        channels, sr = int(info.channels), int(info.rate)

        _vfile.ov_read_float.restype = _c_long
        chans = []
        pcm_ptr = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))()
        bitstream = ctypes.c_int(0)
        while True:
            got = _vfile.ov_read_float(
                vf, ctypes.byref(pcm_ptr), ctypes.c_int(4096),
                ctypes.byref(bitstream))
            if got <= 0:
                assert got == 0, f"ov_read_float error {got}"
                break
            block = np.empty((channels, got), np.float32)
            for ch in range(channels):
                block[ch] = np.ctypeslib.as_array(pcm_ptr[ch],
                                                  shape=(got,))
            chans.append(block)
        _vfile.ov_clear(vf)
        pcm = (np.concatenate(chans, axis=1) if chans
               else np.zeros((channels, 0), np.float32))
        return pcm, sr
    finally:
        if tmp is not None:
            tmp.close()
            Path(tmp.name).unlink(missing_ok=True)
