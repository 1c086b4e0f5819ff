"""Ogg-Speex ingest (io/speex.py) vs libspeex driven independently.

The reference decodes any .ogg payload via its ffmpeg subprocess
(services/audio_processor.py:76-86), which includes legacy Ogg-Speex
call recordings; these tests pin our in-process equivalent: container
glue bit-exact against packet-by-packet libspeex decode, probe/scan
behavior, and the serving bytes path.
"""

import ctypes

import numpy as np
import pytest

from audio_processor_tpu.io.decode import load_audio, load_audio_bytes, probe
from audio_processor_tpu.io.ogg import probe_ogg
from audio_processor_tpu.io.speex import (
    SPEEX_GET_FRAME_SIZE,
    SPEEX_INBAND_STEREO,
    SPEEX_SET_ENH,
    SPEEX_SET_HANDLER,
    SpeexBits,
    SpeexCallback,
    _libspeex,
    decode_speex,
    parse_speex_header,
    speex_available,
)
from tests.speex_encoder import encode_ogg_speex, encoder_available

pytestmark = pytest.mark.skipif(not encoder_available(),
                                reason="libspeex not present")


def _signal(rate: int, channels: int, seconds: float = 1.5):
    t = np.arange(int(rate * seconds)) / rate
    base = 0.5 * np.sin(2 * np.pi * 220 * t) * \
        (0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3 * t)))
    rows = [base]
    if channels == 2:
        rows.append(0.8 * base + 0.05 * np.sin(2 * np.pi * 440 * t))
    return np.stack(rows).astype(np.float32)


def _decode_packets_direct(packets, mode, rate, channels, fpp):
    """Independent packet-by-packet libspeex decode (no Ogg layer)."""
    lib = _libspeex()
    st = lib.speex_decoder_init(
        ctypes.c_void_p(lib.speex_lib_get_mode(mode)))
    stereo = None
    try:
        one = ctypes.c_int(1)
        lib.speex_decoder_ctl(ctypes.c_void_p(st), SPEEX_SET_ENH,
                              ctypes.byref(one))
        r = ctypes.c_int(rate)
        lib.speex_decoder_ctl(ctypes.c_void_p(st), 24, ctypes.byref(r))
        fs = ctypes.c_int(0)
        lib.speex_decoder_ctl(ctypes.c_void_p(st), SPEEX_GET_FRAME_SIZE,
                              ctypes.byref(fs))
        frame = fs.value
        if channels == 2:
            stereo = lib.speex_stereo_state_init()
            cb = SpeexCallback(
                callback_id=SPEEX_INBAND_STEREO,
                func=ctypes.cast(lib.speex_std_stereo_request_handler,
                                 ctypes.c_void_p).value,
                data=stereo)
            lib.speex_decoder_ctl(ctypes.c_void_p(st), SPEEX_SET_HANDLER,
                                  ctypes.byref(cb))
        bits = SpeexBits()
        lib.speex_bits_init(ctypes.byref(bits))
        buf = (ctypes.c_int16 * (frame * channels))()
        chunks = []
        try:
            for pkt in packets:
                lib.speex_bits_read_from(ctypes.byref(bits), pkt,
                                         len(pkt))
                for _ in range(fpp):
                    rc = lib.speex_decode_int(ctypes.c_void_p(st),
                                              ctypes.byref(bits), buf)
                    assert rc == 0
                    if channels == 2:
                        lib.speex_decode_stereo_int(
                            buf, frame, ctypes.c_void_p(stereo))
                    chunks.append(np.frombuffer(buf, np.int16).copy())
        finally:
            lib.speex_bits_destroy(ctypes.byref(bits))
        pcm = np.concatenate(chunks).astype(np.float32) / 32768.0
        return pcm.reshape(-1, channels).T
    finally:
        if stereo:
            lib.speex_stereo_state_destroy(ctypes.c_void_p(stereo))
        lib.speex_decoder_destroy(ctypes.c_void_p(st))


@pytest.mark.parametrize("mode,rate", [(0, 8000), (1, 16000)])
@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("fpp", [1, 3])
def test_ogg_path_bit_exact_vs_direct_packet_decode(mode, rate,
                                                    channels, fpp):
    pcm = _signal(rate, channels)
    ogg, packets = encode_ogg_speex(pcm, rate, mode=mode,
                                    frames_per_packet=fpp)
    ours, r = decode_speex(ogg)
    direct = _decode_packets_direct(packets, mode, rate, channels, fpp)
    assert r == rate
    assert ours.shape == direct.shape
    np.testing.assert_array_equal(ours, np.clip(direct, -1.0, 1.0))


@pytest.mark.parametrize("mode,rate", [(0, 8000), (1, 16000), (2, 32000)])
def test_round_trip_correlation(mode, rate):
    pcm = _signal(rate, 1)
    ogg, _ = encode_ogg_speex(pcm, rate, mode=mode)
    out, r = decode_speex(ogg)
    n = min(out.shape[1], pcm.shape[1])
    # The decoder does not trim the codec lookahead (UWB: 64+ samples
    # at 32 kHz), so align by searching small lags.
    corr = max(np.corrcoef(out[0, lag:n], pcm[0, :n - lag])[0, 1]
               for lag in range(0, 257, 16))
    assert r == rate
    assert corr > 0.85, corr


def test_probe_scanner_and_load_paths(tmp_path):
    rate = 16000
    pcm = _signal(rate, 2)
    ogg, _ = encode_ogg_speex(pcm, rate, mode=1)
    p = tmp_path / "call.ogg"
    p.write_bytes(ogg)

    info = probe_ogg(p)
    assert info.encoding == "speex"
    assert info.num_channels == 2 and info.sample_rate == rate
    assert info.num_frames > 0
    assert probe(p).encoding == "speex"

    via_path, r1 = load_audio(p)
    via_bytes, r2 = load_audio_bytes(ogg)
    assert r1 == r2 == rate
    np.testing.assert_array_equal(via_path, via_bytes)

    from audio_processor_tpu.io.scanner import AudioFileScanner

    mono = tmp_path / "mono.ogg"
    mono.write_bytes(encode_ogg_speex(_signal(rate, 1), rate, mode=1)[0])
    files = AudioFileScanner({}).scan_files_parallel(tmp_path)
    assert p in files and mono not in files   # mono rejected


def test_chained_streams_concatenate(tmp_path):
    rate = 8000
    a, _ = encode_ogg_speex(_signal(rate, 2, 0.6), rate, mode=0,
                            serial=1)
    b, _ = encode_ogg_speex(_signal(rate, 2, 0.4), rate, mode=0,
                            serial=2)
    da, _ = decode_speex(a)
    db, _ = decode_speex(b)
    dc, r = decode_speex(a + b)
    assert r == rate
    np.testing.assert_array_equal(dc, np.concatenate([da, db], axis=1))


def test_header_validation():
    with pytest.raises(ValueError):
        parse_speex_header(b"NotSpeex" + b"\x00" * 72)
    hdr = bytearray(b"Speex   " + b"\x00" * 72)
    hdr[40] = 7                      # mode 7: unsupported
    with pytest.raises(ValueError):
        parse_speex_header(bytes(hdr))


def test_missing_lib_raises_actionable_error(monkeypatch):
    import audio_processor_tpu.io.speex as spx

    monkeypatch.setattr(spx, "_lib", None)
    monkeypatch.setattr(spx, "_lib_tried", True)
    assert not speex_available()
    with pytest.raises(RuntimeError, match="libspeex"):
        spx.decode_speex(b"OggS")

def test_chained_rate_change_raises():
    """A chained file mixing narrowband 8 kHz and wideband 16 kHz
    must raise, not relabel 16 kHz PCM as 8 kHz (io/vorbis.py's
    one-rate-per-file chain policy)."""
    a, _ = encode_ogg_speex(_signal(8000, 1, 0.5), 8000, mode=0,
                            serial=1)
    b, _ = encode_ogg_speex(_signal(16000, 1, 0.5), 16000, mode=1,
                            serial=2)
    with pytest.raises(ValueError, match="rate change"):
        decode_speex(a + b)


# ------------------------------------------------------------------
# Robustness: corrupted/truncated Ogg-Speex must yield a clean
# ValueError (or a clean decode) — never a crash, hang or leaked
# internal exception. Subprocess so a segfault at the ctypes/libspeex
# boundary fails the test. (Mirrors the Vorbis/Opus sweeps.)
# ------------------------------------------------------------------

_FUZZ_DRIVER = r"""
import sys
import numpy as np
from audio_processor_tpu.io import speex as speex_mod

sample_path, n_variants = sys.argv[1], int(sys.argv[2])
data = bytearray(open(sample_path, "rb").read())
rng = np.random.default_rng(13)
ran = 0
for k in range(n_variants):
    buf = bytearray(data)
    kind = k % 4
    if kind == 0:    # flip bytes in the header pages
        for _ in range(rng.integers(1, 8)):
            buf[int(rng.integers(0, min(200, len(buf))))] = int(
                rng.integers(0, 256))
    elif kind == 1:  # flip bytes anywhere
        for _ in range(rng.integers(1, 32)):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
    elif kind == 2:  # truncate
        buf = buf[: int(rng.integers(1, len(buf)))]
    else:            # random garbage behind a valid OggS magic
        n = int(rng.integers(32, 8192))
        buf = bytearray(b"OggS") + bytearray(
            rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    try:
        out, sr = speex_mod.decode_speex(bytes(buf))
        assert sr > 0 and out.ndim == 2
        assert np.isfinite(out).all()
    except ValueError:
        pass  # the one sanctioned failure mode
    ran += 1
print(f"speex-fuzz-ok {ran}")
"""


def test_decode_survives_corrupt_streams(tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    ogg, _ = encode_ogg_speex(_signal(16000, 2, 1.0), 16000, mode=1)
    sample = tmp_path / "sample.ogg"
    sample.write_bytes(ogg)
    r = subprocess.run(
        [sys.executable, "-c", _FUZZ_DRIVER, str(sample), "300"],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).resolve().parent.parent)
    assert r.returncode == 0, (
        f"speex decode crashed/leaked on corrupt input:\n"
        f"{r.stdout}\n{r.stderr}")
    assert "speex-fuzz-ok 300" in r.stdout
