"""Parity tests for the first-party Opus decoder
(audio_processor_tpu/io/opusdec/) against the system libopus.

SILK-mode streams must be BIT-EXACT with libopus' int16 decode API:
the SILK decoder is fixed-point in every libopus build, so float
rounding never enters.  Stream fixtures are produced by the libopus
ENCODER in forced modes (an independent implementation of the
encode side), making this a true cross-implementation check.

Reference mechanism replaced: the upstream stack shells audio out to
ffmpeg (services/audio_processor.py:76-86) and never decodes Opus
itself.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from audio_processor_tpu.io.opusdec.decoder import OpusDecoder
from audio_processor_tpu.io.opusdec.packet import parse_packet
from tests.opus_encoder import encoder_available

_SR = 48000
OPUS_APPLICATION_VOIP = 2048
OPUS_SET_BITRATE = 4002
OPUS_SET_BANDWIDTH = 4008
OPUS_SET_COMPLEXITY = 4010
OPUS_SET_FORCE_MODE = 11002
MODE_SILK_ONLY = 1000
_BW = {"NB": 1101, "MB": 1102, "WB": 1103}

pytestmark = pytest.mark.skipif(
    not encoder_available(), reason="system libopus unavailable")


def _lib():
    lib = ctypes.CDLL(ctypes.util.find_library("opus"))
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.opus_encode_float.restype = ctypes.c_int32
    lib.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int32]
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.opus_decode.restype = ctypes.c_int
    lib.opus_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int, ctypes.c_int]
    return lib


def _speechy(n, channels, seed=0):
    """Pitch-pulse + noise signal that drives the encoder through
    voiced, unvoiced and inactive SILK frame types."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / _SR
    out = np.zeros((n, channels), np.float32)
    for c in range(channels):
        f0 = 110.0 + 40 * c
        sig = np.zeros(n)
        for h in range(1, 12):
            sig += np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6)) / h
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t + c)
        out[:, c] = (0.3 * sig * env
                     + rng.standard_normal(n) * 0.02).astype(np.float32)
    return np.clip(out, -0.99, 0.99)


def _encode_silk(pcm, channels, bw="WB", bitrate=24000, frame_ms=20):
    lib = _lib()
    err = ctypes.c_int(0)
    enc = ctypes.c_void_p(lib.opus_encoder_create(
        _SR, channels, OPUS_APPLICATION_VOIP, ctypes.byref(err)))
    assert err.value == 0
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BITRATE),
                         ctypes.c_int32(bitrate))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_COMPLEXITY),
                         ctypes.c_int32(10))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BANDWIDTH),
                         ctypes.c_int32(_BW[bw]))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_FORCE_MODE),
                         ctypes.c_int32(MODE_SILK_ONLY))
    frame = _SR * frame_ms // 1000
    pcm = np.asarray(pcm, np.float32).reshape(-1, channels)
    out = ctypes.create_string_buffer(8000)
    pkts = []
    for i in range(len(pcm) // frame):
        fr = np.ascontiguousarray(pcm[i * frame:(i + 1) * frame])
        nb = lib.opus_encode_float(
            enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, out, len(out))
        assert nb > 0
        pkts.append(out.raw[:nb])
    lib.opus_encoder_destroy(ctypes.c_void_p(enc.value))
    return pkts


def _ref_decode(pkts, channels):
    lib = _lib()
    err = ctypes.c_int(0)
    dec = ctypes.c_void_p(lib.opus_decoder_create(
        _SR, channels, ctypes.byref(err)))
    assert err.value == 0
    buf = np.empty(5760 * channels, np.int16)
    outs = []
    for p in pkts:
        n = lib.opus_decode(
            dec, p, len(p),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            5760, 0)
        assert n > 0
        outs.append(buf[:n * channels].reshape(n, channels).copy())
    lib.opus_decoder_destroy(ctypes.c_void_p(dec.value))
    return outs


def _assert_stream_exact(pkts, channels):
    refs = _ref_decode(pkts, channels)
    dec = OpusDecoder(channels)
    assert any(parse_packet(p).mode == "silk" for p in pkts)
    for i, (p, ref) in enumerate(zip(pkts, refs)):
        mine = dec.decode_int16(p)
        assert mine.shape == ref.shape, f"packet {i} shape"
        assert np.array_equal(mine, ref), (
            f"packet {i}: "
            f"{int((mine != ref).sum())}/{ref.size} samples differ")


@pytest.mark.parametrize("bw", ["NB", "MB", "WB"])
def test_silk_mono_bandwidths_bit_exact(bw):
    pcm = _speechy(_SR, 1)
    _assert_stream_exact(_encode_silk(pcm, 1, bw=bw), 1)


@pytest.mark.parametrize("frame_ms", [10, 20, 40, 60])
def test_silk_frame_durations_bit_exact(frame_ms):
    pcm = _speechy(_SR, 1)
    _assert_stream_exact(
        _encode_silk(pcm, 1, frame_ms=frame_ms, bitrate=16000), 1)


@pytest.mark.parametrize("scenario", ["decorrelated", "correlated",
                                      "quiet_side"])
def test_silk_stereo_bit_exact(scenario):
    n = 2 * _SR
    if scenario == "decorrelated":
        pcm = _speechy(n, 2)
    elif scenario == "correlated":
        pcm = np.repeat(_speechy(n, 1), 2, axis=1)
    else:  # near-silent side drives mid-only coding + side resets
        pcm = np.concatenate(
            [_speechy(n, 1), 0.02 * _speechy(n, 1, seed=5)], axis=1)
    _assert_stream_exact(_encode_silk(pcm, 2, bitrate=40000), 2)


def test_silk_low_bitrate_voiced_bit_exact():
    # 6 kb/s NB leans on LTP + conditional coding heavily
    pcm = _speechy(2 * _SR, 1)
    _assert_stream_exact(_encode_silk(pcm, 1, bw="NB", bitrate=6000), 1)


def test_fallback_ogg_decode_matches_libopus(monkeypatch):
    """decode_opus via the first-party fallback == via libopus."""
    from audio_processor_tpu.io import opus as opus_mod
    from tests.opus_encoder import opus_head, opus_tags
    from tests.vorbis_encoder import ogg_page

    pcm = _speechy(_SR, 2)
    pkts = _encode_silk(pcm, 2, bitrate=40000)
    serial = 0x51AB
    pages = [ogg_page([opus_head(2, 312)], serial, 0, 0, 0x2),
             ogg_page([opus_tags()], serial, 1, 0, 0x0)]
    granule = 0
    for i, p in enumerate(pkts):
        granule += 960
        pages.append(ogg_page([p], serial, 2 + i, granule,
                              0x4 if i == len(pkts) - 1 else 0x0))
    ogg = b"".join(pages)

    ref_pcm, sr = opus_mod.decode_opus(ogg)
    monkeypatch.setattr(opus_mod, "_load", lambda: None)
    got_pcm, sr2 = opus_mod.decode_opus(ogg)
    assert sr == sr2 == _SR
    assert ref_pcm.shape == got_pcm.shape
    # libopus float API == int16/32768 exactly for SILK-only streams
    assert np.array_equal(ref_pcm, got_pcm)

    # range decode falls back too (first-party TOC duration index)
    ref_rng, _ = opus_mod.decode_opus_range(ogg, 4800, 9600)
    assert np.allclose(
        ref_rng, ref_pcm[:, 4800:14400], atol=1e-6)


def test_fallback_ogg_decode_celt_close(monkeypatch):
    """CELT-mode Ogg stream through the fallback: float path matches
    libopus decode_float to 1 LSB (float32 vs float64 rounding)."""
    from audio_processor_tpu.io import opus as opus_mod
    from tests.opus_encoder import opus_head, opus_tags
    from tests.vorbis_encoder import ogg_page

    pcm = _speechy(_SR, 1)
    pkts = _encode_mode(pcm, 1, MODE_CELT_ONLY, "FB", 64000)
    serial = 0x51AC
    pages = [ogg_page([opus_head(1, 312)], serial, 0, 0, 0x2),
             ogg_page([opus_tags()], serial, 1, 0, 0x0)]
    granule = 0
    for i, p in enumerate(pkts):
        granule += 960
        pages.append(ogg_page([p], serial, 2 + i, granule,
                              0x4 if i == len(pkts) - 1 else 0x0))
    ogg = b"".join(pages)
    ref_pcm, _ = opus_mod.decode_opus(ogg)
    monkeypatch.setattr(opus_mod, "_load", lambda: None)
    got_pcm, _ = opus_mod.decode_opus(ogg)
    assert ref_pcm.shape == got_pcm.shape
    assert np.abs(ref_pcm - got_pcm).max() <= 1.01 / 32768


# --------------------------------------------------------------------
# CELT + hybrid modes (float path: tolerance is 1 int16 LSB, the
# reference float32 vs this decoder's float64 rounding)
# --------------------------------------------------------------------

_CELT_BW = {"NB": 1101, "WB": 1103, "SWB": 1104, "FB": 1105}
MODE_HYBRID = 1001
MODE_CELT_ONLY = 1002
OPUS_APPLICATION_AUDIO = 2049


def _encode_mode(pcm, channels, mode, bw="FB", bitrate=64000,
                 frame_ms=20, complexity=10):
    lib = _lib()
    err = ctypes.c_int(0)
    app = OPUS_APPLICATION_AUDIO if mode == MODE_CELT_ONLY \
        else OPUS_APPLICATION_VOIP
    enc = ctypes.c_void_p(lib.opus_encoder_create(
        _SR, channels, app, ctypes.byref(err)))
    assert err.value == 0
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BITRATE),
                         ctypes.c_int32(bitrate))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_COMPLEXITY),
                         ctypes.c_int32(complexity))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BANDWIDTH),
                         ctypes.c_int32(_CELT_BW[bw]))
    if mode is not None:
        lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_FORCE_MODE),
                             ctypes.c_int32(mode))
    frame = int(_SR * frame_ms) // 1000
    pcm = np.asarray(pcm, np.float32).reshape(-1, channels)
    out = ctypes.create_string_buffer(8000)
    pkts = []
    for i in range(len(pcm) // frame):
        fr = np.ascontiguousarray(pcm[i * frame:(i + 1) * frame])
        nb = lib.opus_encode_float(
            enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, out, len(out))
        assert nb > 0
        pkts.append(out.raw[:nb])
    lib.opus_encoder_destroy(ctypes.c_void_p(enc.value))
    return pkts


def _transient(n, channels, seed=7):
    rng = np.random.default_rng(seed)
    out = rng.standard_normal((n, channels)).astype(np.float32) * 0.02
    for p in range(0, n, 2400):
        out[p:p + 120] += rng.standard_normal(
            (min(120, n - p), channels)).astype(np.float32) * 0.7
    return np.clip(out, -.99, .99)


def _assert_stream_close(pkts, channels, tol=1, mode=None):
    refs = _ref_decode(pkts, channels)
    dec = OpusDecoder(channels)
    if mode is not None:
        assert any(parse_packet(p).mode == mode for p in pkts)
    for i, (p, ref) in enumerate(zip(pkts, refs)):
        mine = dec.decode_int16(p)
        assert mine.shape == ref.shape, f"packet {i} shape"
        d = int(np.abs(mine.astype(np.int32)
                       - ref.astype(np.int32)).max())
        assert d <= tol, f"packet {i}: max abs diff {d} > {tol}"


@pytest.mark.parametrize("bw", ["NB", "WB", "SWB", "FB"])
def test_celt_bandwidths_close(bw):
    _assert_stream_close(
        _encode_mode(_speechy(_SR, 1), 1, MODE_CELT_ONLY, bw, 48000),
        1, mode="celt")


@pytest.mark.parametrize("frame_ms", [2.5, 5, 10, 20])
def test_celt_frame_sizes_close(frame_ms):
    _assert_stream_close(
        _encode_mode(_speechy(_SR, 1), 1, MODE_CELT_ONLY, "FB",
                     96000, frame_ms), 1, mode="celt")


@pytest.mark.parametrize("channels,bitrate", [(1, 64000), (2, 96000)])
def test_celt_transients_close(channels, bitrate):
    """Transient frames: short blocks, tf changes, anti-collapse."""
    _assert_stream_close(
        _encode_mode(_transient(2 * _SR, channels), channels,
                     MODE_CELT_ONLY, "FB", bitrate), channels)


def test_celt_low_bitrate_folding_close():
    _assert_stream_close(
        _encode_mode(_speechy(2 * _SR, 1), 1, MODE_CELT_ONLY, "FB",
                     12000), 1)


@pytest.mark.parametrize("channels", [1, 2])
def test_hybrid_close(channels):
    _assert_stream_close(
        _encode_mode(_speechy(2 * _SR, channels), channels,
                     MODE_HYBRID, "FB", 48000 * channels), channels,
        mode="hybrid")


def test_auto_mode_transitions_close():
    """Unforced encoder switching modes mid-stream: exercises the
    redundant-frame crossfades and SILK/CELT state reset rules."""
    n = 3 * _SR
    t = np.arange(n) / _SR
    rng = np.random.default_rng(3)
    speech = _speechy(n, 1)[:, 0]
    music = (0.4 * np.sin(2 * np.pi * 880 * t)
             + 0.3 * np.sin(2 * np.pi * 1320.5 * t)
             + 0.1 * rng.standard_normal(n))
    mix = np.where((t > 1.0) & (t < 2.0), music,
                   speech).astype(np.float32)
    pkts = _encode_mode(mix, 1, None, "FB", 32000)
    modes = {parse_packet(p).mode for p in pkts}
    assert len(modes) >= 2, f"expected mode switches, got {modes}"
    _assert_stream_close(pkts, 1)


def test_softclip_engages_on_hot_signal():
    """Clipping-level input: the int16 path must reproduce libopus'
    opus_pcm_soft_clip (nonlinear), not a hard clamp."""
    pcm = np.clip(_transient(_SR, 1) * 3.0, -0.999, 0.999)
    pkts = _encode_mode(pcm, 1, MODE_CELT_ONLY, "FB", 96000)
    _assert_stream_close(pkts, 1)


def test_multistream_family1_parity():
    """3-channel family-1 (2 streams: 1 coupled + 1 mono): the
    first-party OpusMSDecoder parses the Appendix-B self-delimited
    sub-packets and matches libopus' multistream decoder."""
    from audio_processor_tpu.io.opusdec.decoder import OpusMSDecoder

    lib = _lib()
    lib.opus_multistream_encoder_create.restype = ctypes.c_void_p
    lib.opus_multistream_encoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.opus_multistream_encode_float.restype = ctypes.c_int32
    lib.opus_multistream_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int32]
    lib.opus_multistream_decoder_create.restype = ctypes.c_void_p
    lib.opus_multistream_decoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.opus_multistream_decode.restype = ctypes.c_int
    lib.opus_multistream_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int, ctypes.c_int]

    channels, streams, coupled = 3, 2, 1
    mapping = bytes([0, 1, 2])
    err = ctypes.c_int(0)
    enc = ctypes.c_void_p(lib.opus_multistream_encoder_create(
        _SR, channels, streams, coupled, mapping,
        OPUS_APPLICATION_VOIP, ctypes.byref(err)))
    assert err.value == 0
    lib.opus_multistream_encoder_ctl(
        enc, ctypes.c_int(OPUS_SET_BITRATE), ctypes.c_int32(96000))

    pcm = _speechy(_SR, channels)
    out = ctypes.create_string_buffer(8000)
    pkts = []
    for i in range(len(pcm) // 960):
        fr = np.ascontiguousarray(pcm[i * 960:(i + 1) * 960])
        nb = lib.opus_multistream_encode_float(
            enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            960, out, len(out))
        assert nb > 0
        pkts.append(out.raw[:nb])
    lib.opus_multistream_encoder_destroy(ctypes.c_void_p(enc.value))

    dec = ctypes.c_void_p(lib.opus_multistream_decoder_create(
        _SR, channels, streams, coupled, mapping, ctypes.byref(err)))
    assert err.value == 0
    buf = np.empty(5760 * channels, np.int16)
    mine = OpusMSDecoder(channels, streams, coupled, list(mapping))
    for i, p in enumerate(pkts):
        n = lib.opus_multistream_decode(
            dec, p, len(p),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            5760, 0)
        assert n > 0
        ref = buf[:n * channels].reshape(n, channels).copy()
        got = mine.decode_int16(p)
        assert got.shape == ref.shape
        d = int(np.abs(got.astype(np.int32)
                       - ref.astype(np.int32)).max())
        assert d <= 1, f"packet {i}: max diff {d}"
    lib.opus_multistream_decoder_destroy(ctypes.c_void_p(dec.value))


def test_dtx_stream_decodes_and_reconverges():
    """DTX streams (1-2 byte packets during silence): the fallback
    runs the ported silk_PLC/silk_CNG, so the ENTIRE stream is
    BIT-EXACT with libopus — concealed frames (comfort noise
    included) AND the first good frames after each gap, which apply
    BWE_AFTER_LOSS_Q16 LPC bandwidth expansion + the concealment's
    LastGainIndex reset (the formerly 'unidentified post-loss state
    nuance', solved in r4 by live-poking a libopus decoder's state)."""
    lib = _lib()
    err = ctypes.c_int(0)
    enc = ctypes.c_void_p(lib.opus_encoder_create(
        _SR, 1, OPUS_APPLICATION_VOIP, ctypes.byref(err)))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BITRATE),
                         ctypes.c_int32(24000))
    lib.opus_encoder_ctl(enc, ctypes.c_int(4016),  # OPUS_SET_DTX
                         ctypes.c_int32(1))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_FORCE_MODE),
                         ctypes.c_int32(MODE_SILK_ONLY))
    pcm = np.concatenate([
        _speechy(_SR, 1),
        np.zeros((3 * _SR // 2, 1), np.float32),
        _speechy(3 * _SR, 1, seed=9)])
    out = ctypes.create_string_buffer(8000)
    pkts = []
    for i in range(len(pcm) // 960):
        fr = np.ascontiguousarray(pcm[i * 960:(i + 1) * 960])
        nb = lib.opus_encode_float(
            enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            960, out, len(out))
        assert nb > 0
        pkts.append(out.raw[:nb])
    lib.opus_encoder_destroy(ctypes.c_void_p(enc.value))

    sizes = [len(p) for p in pkts]
    dtx = [i for i, s in enumerate(sizes) if s <= 2]
    assert dtx, "encoder produced no DTX packets"
    refs = _ref_decode(pkts, 1)
    dec = OpusDecoder(1)
    diffs = []
    for p, r in zip(pkts, refs):
        m = dec.decode_int16(p)
        assert m.shape == r.shape
        diffs.append(int(np.abs(m.astype(np.int32)
                                - r.astype(np.int32)).max()))
    # Exact end to end — before, inside and after every DTX gap — up
    # to the int16 API's soft-clip rounding edge (float64 vs libopus
    # float32 can flip round-half-even by 1 LSB on near-full-scale
    # samples; the float APIs compare to 0.0 in
    # test_silk_loss_concealment_bit_exact_fresh).
    assert max(diffs) <= 1, (max(diffs), int(np.argmax(diffs)))


def test_fuzz_corrupt_packets_never_hang_or_crash():
    """Serving feeds untrusted bytes to the decoder: corrupted and
    random packets must either decode or raise a clean ValueError
    subclass — never crash, hang, or return a wrong-shape buffer."""
    rng = np.random.default_rng(11)
    pcm = _speechy(_SR // 2, 1)
    base = (_encode_silk(pcm, 1, bitrate=16000)
            + _encode_mode(pcm, 1, MODE_CELT_ONLY, "FB", 48000)
            + _encode_mode(pcm, 1, MODE_HYBRID, "FB", 48000))
    cases = []
    for p in base[:60]:
        b = bytearray(p)
        k = rng.integers(0, len(b))
        b[k] ^= 1 << int(rng.integers(0, 8))          # bit flip
        cases.append(bytes(b))
        cases.append(bytes(b[:max(1, len(b) // 2)]))  # truncation
    for n in (1, 2, 3, 7, 50):
        for _ in range(20):
            cases.append(rng.integers(0, 256, n,
                                      dtype=np.uint8).tobytes())
    dec = OpusDecoder(1)
    ok = err = 0
    for c in cases:
        try:
            out = dec.decode_int16(c)
            assert out.ndim == 2 and out.shape[1] == 1
            assert out.shape[0] <= 5760 * 3  # <= 120 ms longest? 60ms*48k
            ok += 1
        except ValueError:
            err = err + 1
            dec = OpusDecoder(1)  # fresh state after an error
    assert ok + err == len(cases)


@pytest.mark.parametrize("pkt_ch,dec_ch,mode,tol", [
    (1, 2, MODE_SILK_ONLY, 0),   # mono packets, stereo decoder
    (2, 1, MODE_SILK_ONLY, 0),   # stereo packets, mono downmix
    (1, 2, MODE_CELT_ONLY, 1),
    (2, 1, MODE_CELT_ONLY, 1),
])
def test_channel_count_adaptation(pkt_ch, dec_ch, mode, tol):
    """Decoder channel count != packet channel count: duplication,
    and the internal-rate (pre-resampler) SILK downmix / CELT
    frequency-domain downmix libopus uses."""
    pcm = _speechy(_SR, pkt_ch)
    if mode == MODE_SILK_ONLY:
        pkts = _encode_silk(pcm, pkt_ch, bitrate=16000 * pkt_ch)
    else:
        pkts = _encode_mode(pcm, pkt_ch, mode, "FB", 48000 * pkt_ch)
    refs = _ref_decode(pkts, dec_ch)
    dec = OpusDecoder(dec_ch)
    for i, (p, r) in enumerate(zip(pkts, refs)):
        m = dec.decode_int16(p)
        assert m.shape == r.shape
        d = int(np.abs(m.astype(np.int32) - r.astype(np.int32)).max())
        assert d <= tol, f"packet {i}: {d} > {tol}"


def test_starved_stereo_emits_mono_packets_bit_exact():
    """A bitrate-starved stereo SILK session drops to mono-TOC
    packets; the stereo decoder must duplicate them bit-exactly."""
    pcm = np.repeat(_speechy(2 * _SR, 1), 2, axis=1)
    pkts = _encode_silk(pcm, 2, bitrate=7000)
    assert any(not parse_packet(p).stereo for p in pkts)
    _assert_stream_exact(pkts, 2)


OPUS_SET_FORCE_CHANNELS = 4022


@pytest.mark.parametrize("mode,tol", [(MODE_SILK_ONLY, 0),
                                      (MODE_CELT_ONLY, 1)])
def test_mid_stream_channel_switching(mode, tol):
    """OPUS_SET_FORCE_CHANNELS toggled mid-stream: mono->stereo resets
    the stereo prediction/side history and continues the right channel
    from the left's resampler state; stereo->mono runs the first mono
    frame's right channel through channel 1's resampler; mono CELT
    frames merge both channels' energy history (all dec_API.c /
    celt_decode_with_ec semantics)."""
    lib = _lib()
    err = ctypes.c_int(0)
    app = 2049 if mode == MODE_CELT_ONLY else OPUS_APPLICATION_VOIP
    enc = ctypes.c_void_p(lib.opus_encoder_create(
        _SR, 2, app, ctypes.byref(err)))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BITRATE),
                         ctypes.c_int32(48000))
    if mode == MODE_SILK_ONLY:
        # pin WB: unconstrained 48 kb/s drifts to FB = hybrid packets
        lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BANDWIDTH),
                             ctypes.c_int32(_BW["WB"]))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_FORCE_MODE),
                         ctypes.c_int32(mode))
    # headroom keeps decoded peaks under +-1.0 so the (float) soft
    # clip never engages and the SILK case stays bit-exact
    pcm = 0.6 * _speechy(3 * _SR, 2)
    out = ctypes.create_string_buffer(4000)
    pkts = []
    for i in range(len(pcm) // 960):
        for tgt, at in [(1, 40), (2, 80), (1, 120)]:
            if i == at:
                lib.opus_encoder_ctl(
                    enc, ctypes.c_int(OPUS_SET_FORCE_CHANNELS),
                    ctypes.c_int32(tgt))
        fr = np.ascontiguousarray(pcm[i * 960:(i + 1) * 960])
        nb = lib.opus_encode_float(
            enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            960, out, len(out))
        pkts.append(out.raw[:nb])
    lib.opus_encoder_destroy(ctypes.c_void_p(enc.value))
    assert len({parse_packet(p).stereo for p in pkts}) == 2
    _assert_stream_close(pkts, 2, tol=tol)


def test_multistream_family255_parity():
    """Family-255-style layout (RFC 7845 §5.1.1.3: no defined channel
    meaning — wire format identical to family 1): permuted mapping
    plus a 255 silence slot. 4 output channels from 2 streams
    (1 coupled): out ch0 <- mono stream, ch1/ch2 <- coupled pair,
    ch3 <- silence. First-party OpusMSDecoder vs libopus."""
    from audio_processor_tpu.io.opusdec.decoder import OpusMSDecoder

    lib = _lib()
    lib.opus_multistream_encoder_create.restype = ctypes.c_void_p
    lib.opus_multistream_encoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.opus_multistream_encode_float.restype = ctypes.c_int32
    lib.opus_multistream_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int32]
    lib.opus_multistream_decoder_create.restype = ctypes.c_void_p
    lib.opus_multistream_decoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.opus_multistream_decode.restype = ctypes.c_int
    lib.opus_multistream_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int, ctypes.c_int]

    channels, streams, coupled = 4, 2, 1
    mapping = bytes([2, 0, 1, 255])
    err = ctypes.c_int(0)
    enc = ctypes.c_void_p(lib.opus_multistream_encoder_create(
        _SR, channels, streams, coupled, mapping,
        OPUS_APPLICATION_VOIP, ctypes.byref(err)))
    assert err.value == 0
    lib.opus_multistream_encoder_ctl(
        enc, ctypes.c_int(OPUS_SET_BITRATE), ctypes.c_int32(128000))

    pcm = _speechy(_SR, channels)
    out = ctypes.create_string_buffer(8000)
    pkts = []
    for i in range(len(pcm) // 960):
        fr = np.ascontiguousarray(pcm[i * 960:(i + 1) * 960])
        nb = lib.opus_multistream_encode_float(
            enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            960, out, len(out))
        assert nb > 0
        pkts.append(out.raw[:nb])
    lib.opus_multistream_encoder_destroy(ctypes.c_void_p(enc.value))

    dec = ctypes.c_void_p(lib.opus_multistream_decoder_create(
        _SR, channels, streams, coupled, mapping, ctypes.byref(err)))
    assert err.value == 0
    buf = np.empty(5760 * channels, np.int16)
    mine = OpusMSDecoder(channels, streams, coupled, list(mapping))
    for i, p in enumerate(pkts):
        n = lib.opus_multistream_decode(
            dec, p, len(p),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            5760, 0)
        assert n > 0
        ref = buf[:n * channels].reshape(n, channels).copy()
        got = mine.decode_int16(p)
        assert got.shape == ref.shape
        d = int(np.abs(got.astype(np.int32)
                       - ref.astype(np.int32)).max())
        assert d <= 1, f"packet {i}: max diff {d}"
        assert not got[:, 3].any(), "silence slot must stay zero"
    lib.opus_multistream_decoder_destroy(ctypes.c_void_p(dec.value))


# ----------------------------------------------------------------------
# Packet-loss concealment (celt_plc.py / silk_plc.py / decoder glue)
# ----------------------------------------------------------------------

_MODE_ALL = {"silk": 1000, "hybrid": 1001, "celt": 1002}
_BW_ALL = {"NB": 1101, "MB": 1102, "WB": 1103, "SWB": 1104, "FB": 1105}


def _encode_forced(pcm, channels, mode, bw, bitrate, frame_ms,
                   app=2049):
    lib = _lib()
    err = ctypes.c_int(0)
    enc = ctypes.c_void_p(lib.opus_encoder_create(
        _SR, channels, app, ctypes.byref(err)))
    assert err.value == 0
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BITRATE),
                         ctypes.c_int32(bitrate))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BANDWIDTH),
                         ctypes.c_int32(_BW_ALL[bw]))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_FORCE_MODE),
                         ctypes.c_int32(_MODE_ALL[mode]))
    frame = _SR * frame_ms // 1000
    pcm = np.asarray(pcm, np.float32).reshape(-1, channels)
    out = ctypes.create_string_buffer(8000)
    pkts = []
    for i in range(len(pcm) // frame):
        fr = np.ascontiguousarray(pcm[i * frame:(i + 1) * frame])
        nb = lib.opus_encode_float(
            enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, out, len(out))
        assert nb > 0
        pkts.append(out.raw[:nb])
    lib.opus_encoder_destroy(ctypes.c_void_p(enc.value))
    return pkts


def _float_lib():
    lib = _lib()
    lib.opus_decode_float.restype = ctypes.c_int
    lib.opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    return lib


def _compare_with_losses(pkts, channels, losses, frame):
    """Decode both ways with the loss mask (float APIs); returns the
    list of per-packet max abs float diffs."""
    lib = _float_lib()
    err = ctypes.c_int(0)
    dec = ctypes.c_void_p(lib.opus_decoder_create(
        _SR, channels, ctypes.byref(err)))
    fbuf = np.empty(5760 * channels, np.float32)
    fptr = fbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    mine = OpusDecoder(channels)
    diffs = []
    for i, p in enumerate(pkts):
        if losses[i]:
            n = lib.opus_decode_float(dec, None, 0, fptr, frame, 0)
            got = mine.decode_lost_float(frame)
        else:
            n = lib.opus_decode_float(dec, p, len(p), fptr, 5760, 0)
            got = mine.decode_float(p)
        assert n > 0
        ref = fbuf[:n * channels].reshape(n, channels).astype(np.float64)
        assert got.shape == ref.shape
        diffs.append(float(np.abs(got - ref).max()))
    lib.opus_decoder_destroy(ctypes.c_void_p(dec.value))
    return diffs


def test_celt_plc_pitch_and_noise_vs_libopus():
    """CELT packet-loss concealment (celt_plc.py): a single loss runs
    the pitch-based extrapolation, a 7-long burst crosses into the
    noise-based regime (loss_count >= 5); every concealed frame must
    track libopus' celt_decode_lost within a float tolerance and the
    stream must reconverge after each gap."""
    pcm = _speechy(int(1.2 * _SR), 1, seed=11)
    pkts = _encode_forced(pcm, 1, "celt", "FB", 96000, 20)
    losses = np.zeros(len(pkts), bool)
    losses[12] = True          # isolated: pitch PLC
    losses[30:37] = True       # burst: pitch -> noise PLC
    diffs = _compare_with_losses(pkts, 1, losses, 960)
    for i, d in enumerate(diffs):
        if losses[i]:
            assert d < 1e-3, f"concealed pkt{i}: {d}"
    # reconvergence: the last 5 good packets are clean
    assert max(diffs[-5:]) < 1e-3, diffs[-5:]


def test_silk_loss_concealment_bit_exact_fresh():
    """A loss on clean SILK state conceals BIT-EXACTLY (silk_plc.py),
    for 10/20/40 ms frames, mono and stereo. Since r4 (BWE_AFTER_LOSS
    LPC expansion + LastGainIndex reset) the post-loss frames are ALSO
    bit-exact, so concealed AND post-loss frames are all asserted
    exact (max diff == 0 over every frame)."""
    for ch, frame_ms in ((1, 20), (2, 20), (1, 10), (2, 40)):
        frame = _SR * frame_ms // 1000
        pcm = _speechy(int(1.0 * _SR), ch, seed=3 + ch)
        pkts = _encode_forced(pcm, ch, "silk", "WB", 24000 * ch,
                              frame_ms, app=2048)
        losses = np.zeros(len(pkts), bool)
        losses[len(pkts) // 2] = True
        diffs = _compare_with_losses(pkts, ch, losses, frame)
        # SILK loss paths are bit-exact END TO END: the concealed
        # frame AND every post-loss frame (BWE_AFTER_LOSS LPC
        # expansion + LastGainIndex reset, r4).
        assert max(diffs) == 0.0, \
            (ch, frame_ms, max(diffs), int(np.argmax(diffs)))


def test_mode_transition_plc_smoothing_vs_libopus():
    """Redundancy-free mode transitions (packets butt-spliced from two
    forced encoders) engage the decoder-side 5 ms PLC crossfade
    (opus_decode_frame's `transition` machinery) — all four
    directions must match libopus."""
    for m1, m2 in (("hybrid", "celt"), ("silk", "celt"),
                   ("celt", "silk"), ("celt", "hybrid")):
        ch, frame = 1, 960
        pcm = _speechy(int(1.0 * _SR), ch, seed=42)
        bw1 = "FB" if m1 in ("celt", "hybrid") else "WB"
        bw2 = "FB" if m2 in ("celt", "hybrid") else "WB"
        e1 = _encode_forced(pcm[:len(pcm) // 2], ch, m1, bw1, 24000, 20,
                            app=2048 if m1 != "celt" else 2049)
        e2 = _encode_forced(pcm[len(pcm) // 2:], ch, m2, bw2, 24000, 20,
                            app=2048 if m2 != "celt" else 2049)
        pkts = e1 + e2
        losses = np.zeros(len(pkts), bool)
        diffs = _compare_with_losses(pkts, ch, losses, frame)
        assert max(diffs) < 5e-4, (m1, m2, max(diffs),
                                   int(np.argmax(diffs)))


def test_hybrid_loss_noise_plc_vs_libopus():
    """Hybrid-mode losses conceal with SILK PLC + CELT noise-based
    PLC (start band 17): concealed packets on fresh state match
    libopus, and the stream reconverges."""
    pcm = _speechy(int(1.0 * _SR), 2, seed=9)
    pkts = _encode_forced(pcm, 2, "hybrid", "FB", 64000, 20, app=2048)
    losses = np.zeros(len(pkts), bool)
    losses[10] = True
    losses[25:27] = True
    diffs = _compare_with_losses(pkts, 2, losses, 960)
    assert diffs[10] < 1e-3, diffs[10]
    assert max(diffs[-3:]) < 1e-3, diffs[-3:]


def test_encoder_settings_matrix_vs_libopus():
    """Real-encoder matrix (VERDICT r3 #8): VBR / constrained-VBR /
    CBR, complexity 0/5/10, DTX on, encoder input rates 8/12/16/24/48
    kHz, mono and stereo — every stream decoded against libopus'
    float API. DTX emits 1-byte TOC-only packets, which both decoders
    conceal (real PLC since r4); diffs within 0.3 s after a DTX gap
    fall under the documented post-loss window, steady state must be
    tight, and concealment on fresh state must match closely."""
    OPUS_SET_VBR = 4006
    OPUS_SET_VBR_CONSTRAINT = 4020
    OPUS_SET_DTX = 4016
    lib = _float_lib()

    matrix = [
        # (ch, enc_rate, vbr, cvbr, dtx, complexity, bitrate)
        (1, 8000, 1, 0, 0, 0, 12000),
        (1, 12000, 1, 0, 0, 5, 16000),
        (1, 24000, 1, 0, 0, 10, 32000),
        (1, 48000, 0, 0, 0, 0, 24000),     # CBR
        (2, 48000, 0, 0, 0, 10, 64000),    # CBR stereo
        (2, 48000, 1, 1, 0, 5, 48000),     # constrained VBR
        (1, 16000, 1, 0, 1, 10, 20000),    # DTX
        (2, 24000, 1, 0, 1, 5, 40000),     # DTX stereo
    ]
    for ch, enc_rate, vbr, cvbr, dtx, cx, br in matrix:
        frame = enc_rate * 20 // 1000
        n = int(1.2 * enc_rate)
        t = np.arange(n) / enc_rate
        rng = np.random.default_rng(enc_rate + cx)
        sig = np.zeros(n)
        for h in range(1, 9):
            sig += np.sin(2 * np.pi * 150 * h * t + h) / h
        x = (0.3 * sig * (0.5 + 0.5 * np.sin(2 * np.pi * 1.1 * t))
             + 0.01 * rng.standard_normal(n)).astype(np.float32)
        if dtx:
            x[n // 3: 2 * n // 3] = 0.0   # silence to trigger DTX
        pcm = np.stack([x, 0.8 * x], axis=1)[:, :ch]
        pcm = np.ascontiguousarray(np.clip(pcm, -0.95, 0.95))

        err = ctypes.c_int(0)
        enc = ctypes.c_void_p(lib.opus_encoder_create(
            enc_rate, ch, 2048, ctypes.byref(err)))
        assert err.value == 0
        for ctl, v in ((OPUS_SET_BITRATE, br), (OPUS_SET_COMPLEXITY, cx),
                       (OPUS_SET_VBR, vbr),
                       (OPUS_SET_VBR_CONSTRAINT, cvbr),
                       (OPUS_SET_DTX, dtx)):
            lib.opus_encoder_ctl(enc, ctypes.c_int(ctl),
                                 ctypes.c_int32(v))
        out = ctypes.create_string_buffer(8000)
        pkts = []
        for i in range(len(pcm) // frame):
            fr = np.ascontiguousarray(pcm[i * frame:(i + 1) * frame])
            nb = lib.opus_encode_float(
                enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                frame, out, len(out))
            assert nb > 0
            pkts.append(out.raw[:nb])
        lib.opus_encoder_destroy(ctypes.c_void_p(enc.value))
        desc = (f"ch={ch} rate={enc_rate} vbr={vbr} cvbr={cvbr} "
                f"dtx={dtx} cx={cx}")
        if dtx:
            assert any(len(p) <= 2 for p in pkts), \
                f"{desc}: DTX never engaged"

        dec = ctypes.c_void_p(lib.opus_decoder_create(
            _SR, ch, ctypes.byref(err)))
        fbuf = np.empty(5760 * ch, np.float32)
        fptr = fbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        mine = OpusDecoder(ch)
        since_gap = 10 ** 6
        for i, p in enumerate(pkts):
            n48 = lib.opus_decode_float(dec, p, len(p), fptr, 5760, 0)
            assert n48 > 0
            ref = fbuf[:n48 * ch].reshape(n48, ch).astype(np.float64)
            got = mine.decode_float(p)
            assert got.shape == ref.shape, (desc, i)
            d = float(np.abs(got - ref).max())
            if len(p) <= 2:           # DTX/concealment packet
                budget = 3e-3 if since_gap >= 50 else 0.05
                since_gap = 0
            else:
                since_gap += 1
                budget = 0.05 if since_gap <= 15 else 5e-3
            assert d <= budget, (desc, i, len(p), d, budget)
        lib.opus_decoder_destroy(ctypes.c_void_p(dec.value))


def test_silk_loss_clusters_bit_exact_nb_stereo():
    """Loss CLUSTERS (a second loss a few good frames after the
    first) conceal bit-exactly too — regression for the CNG
    synth-state partial reset: libopus's good-frame reset zeroes only
    LPC_order (10 at NB/MB) of the 16 synth entries, so the next
    burst's taps read the stale tail of the previous one
    (silk_plc.cng). Before the fix, stereo NB streams diverged up to
    0.5 of full scale in the post-loss window (fuzz seed 31 t95)."""
    for ch, bw, frame_ms, seed in ((2, "NB", 10, 7), (2, "NB", 40, 8),
                                   (1, "MB", 10, 9), (2, "WB", 20, 5)):
        frame = _SR * frame_ms // 1000
        pcm = _speechy(int(1.2 * _SR), ch, seed=seed)
        pkts = _encode_forced(pcm, ch, "silk", bw, 48000 * ch,
                              frame_ms, app=2048)
        losses = np.zeros(len(pkts), bool)
        # clusters: loss, a few good frames, loss again — repeatedly
        for k in range(10, len(pkts) - 2, 7):
            losses[k] = True
        diffs = _compare_with_losses(pkts, ch, losses, frame)
        assert max(diffs) == 0.0, \
            (ch, bw, frame_ms, max(diffs), int(np.argmax(diffs)))
