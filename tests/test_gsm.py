"""GSM 06.10 (WAV tag 0x0031 / WAV49) decode parity.

Oracle: the system libgsm driven via ctypes — the same codec library
behind sox/libsndfile's GSM support, which is how the reference
pipeline would decode these files (torchaudio backends;
audio_processor.py:76-86). The first-party decoder
(io/gsm.py GsmDecoder) is asserted BIT-EXACT against libgsm in both
framings; the WAV reader path is additionally round-tripped at the
file level.
"""

import ctypes
import struct

import numpy as np
import pytest

from audio_processor_tpu.io import gsm, wav


def _libgsm_or_skip():
    if not gsm.libgsm_available():
        pytest.skip("libgsm unavailable")
    return gsm._libgsm()


def _encode_wav49_payload(pcm: np.ndarray) -> bytes:
    """[N] int16 at 8 kHz -> WAV49 payload (65-byte blocks) via the
    real libgsm encoder. N padded to a 320 multiple."""
    lib = _libgsm_or_skip()
    if len(pcm) % 320:
        pcm = np.concatenate(
            [pcm, np.zeros(320 - len(pcm) % 320, np.int16)])
    g = lib.gsm_create()
    try:
        lib.gsm_option(ctypes.c_void_p(g), 4,
                       ctypes.byref(ctypes.c_int(1)))
        payload = b""
        for i in range(0, len(pcm), 320):
            b1 = ctypes.create_string_buffer(40)
            b2 = ctypes.create_string_buffer(40)
            f1 = np.ascontiguousarray(pcm[i:i + 160], "<i2")
            f2 = np.ascontiguousarray(pcm[i + 160:i + 320], "<i2")
            lib.gsm_encode(ctypes.c_void_p(g),
                           f1.ctypes.data_as(ctypes.c_void_p), b1)
            lib.gsm_encode(ctypes.c_void_p(g),
                           f2.ctypes.data_as(ctypes.c_void_p), b2)
            # WAV49 pairs: encoder emits 32 then 33 bytes
            payload += b1.raw[:32] + b2.raw[:33]
        return payload
    finally:
        lib.gsm_destroy(ctypes.c_void_p(g))


def _gsm_wav_bytes(payload: bytes, total_frames: int,
                   sr: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHHHH", 0x0031, 1, sr, sr * 65 // 320,
                      65, 0, 2, 320)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 12 + 8
                                  + len(payload)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, total_frames)
            + b"data" + struct.pack("<I", len(payload)) + payload)


def _signals(seed):
    rng = np.random.default_rng(seed)
    n = 3200
    t = np.arange(n) / 8000.0
    yield ("speechy", (np.sin(2 * np.pi * (180 + 40 * np.sin(
        2 * np.pi * 3 * t)) * t) * 9000
        + rng.integers(-2500, 2500, n)).astype(np.int16))
    yield ("hot", np.clip(np.sin(2 * np.pi * 300 * t) * 40000,
                          -32768, 32767).astype(np.int16))
    yield ("noise", rng.integers(-32768, 32768, n).astype(np.int16))
    yield ("silence", np.zeros(n, np.int16))
    sparse = np.zeros(n, np.int16)
    sparse[rng.integers(0, n, 40)] = rng.integers(
        -30000, 30000, 40).astype(np.int16)
    yield ("clicks", sparse)


@pytest.mark.parametrize("seed", [0, 1])
def test_first_party_decoder_bit_exact_vs_libgsm(seed):
    """GsmDecoder == libgsm on WAV49 streams across signal classes
    (speech-like, saturating, full-scale noise, silence, clicks)."""
    for name, pcm in _signals(seed):
        payload = _encode_wav49_payload(pcm)
        oracle = gsm._decode_wav49_libgsm(payload, len(pcm))
        dec = gsm.GsmDecoder()
        ours = np.concatenate(
            [dec.decode_wav49_block(payload[i:i + 65])
             for i in range(0, len(payload), 65)])[:len(pcm)]
        np.testing.assert_array_equal(ours, oracle, err_msg=name)


def test_standard_frame_bit_exact_vs_libgsm():
    """33-byte magic-0xD framing (RFC 3551 packing) decodes bit-exact
    vs libgsm in non-WAV49 mode."""
    lib = _libgsm_or_skip()
    rng = np.random.default_rng(3)
    t = np.arange(1600) / 8000.0
    pcm = (np.sin(2 * np.pi * 250 * t) * 8000
           + rng.integers(-2000, 2000, 1600)).astype("<i2")
    ge = lib.gsm_create()
    gd = lib.gsm_create()
    try:
        dec = gsm.GsmDecoder()
        for i in range(0, 1600, 160):
            f = np.ascontiguousarray(pcm[i:i + 160], "<i2")
            frame = ctypes.create_string_buffer(33)
            lib.gsm_encode(ctypes.c_void_p(ge),
                           f.ctypes.data_as(ctypes.c_void_p), frame)
            o = np.zeros(160, "<i2")
            assert lib.gsm_decode(
                ctypes.c_void_p(gd), frame,
                o.ctypes.data_as(ctypes.c_void_p)) == 0
            ours = dec.decode_standard_frame(frame.raw[:33])
            np.testing.assert_array_equal(ours, o)
    finally:
        lib.gsm_destroy(ctypes.c_void_p(ge))
        lib.gsm_destroy(ctypes.c_void_p(gd))


def test_bad_magic_raises():
    with pytest.raises(ValueError):
        gsm.GsmDecoder().decode_standard_frame(b"\x00" * 33)


def test_gsm_wav_reads_and_probes(tmp_path):
    rng = np.random.default_rng(5)
    pcm = (rng.standard_normal(3000) * 6000).astype(np.int16)
    payload = _encode_wav49_payload(pcm)
    p = tmp_path / "call.wav"
    p.write_bytes(_gsm_wav_bytes(payload, 3000))

    ai = wav.info(p)
    assert ai.encoding == "gsm_ms"
    assert ai.num_channels == 1 and ai.sample_rate == 8000
    assert ai.num_frames == 3000          # fact-trimmed from 3200

    x, sr = wav.read(p)
    assert sr == 8000 and x.shape == (1, 3000)
    oracle = gsm._decode_wav49_libgsm(payload, 3000)
    np.testing.assert_array_equal(
        np.round(x[0] * 32768.0).astype(np.int16), oracle)

    # Random access decodes from the stream head (stateful codec) and
    # must equal the slice of a full read.
    piece, _ = wav.read_range(p, 700, 900)
    np.testing.assert_array_equal(piece, x[:, 700:1600])


def test_gsm_wav_fallback_path_matches(tmp_path, monkeypatch):
    """With libgsm hidden, the first-party fallback decodes the same
    WAV bit-identically through wav.read()."""
    rng = np.random.default_rng(8)
    pcm = (rng.standard_normal(1600) * 9000).astype(np.int16)
    payload = _encode_wav49_payload(pcm)
    p = tmp_path / "fb.wav"
    p.write_bytes(_gsm_wav_bytes(payload, 1600))
    x_fast, _ = wav.read(p)

    monkeypatch.setattr(gsm, "_lib", None)
    monkeypatch.setattr(gsm, "_lib_tried", True)
    assert not gsm.libgsm_available()
    x_fallback, _ = wav.read(p)
    np.testing.assert_array_equal(x_fast, x_fallback)


def test_gsm_wav_trailing_half_block(tmp_path):
    """A trailing 33-byte half block contributes 160 frames."""
    rng = np.random.default_rng(2)
    pcm = (rng.standard_normal(960) * 5000).astype(np.int16)
    payload = _encode_wav49_payload(pcm)
    cut = payload[:2 * 65 + 33]
    p = tmp_path / "half.wav"
    data = _gsm_wav_bytes(cut, 0xFFFFFF)  # fact beyond payload
    p.write_bytes(data)
    ai = wav.info(p)
    assert ai.num_frames == 2 * 320 + 160
    x, _ = wav.read(p)
    assert x.shape == (1, 800)
    # the decoded prefix matches the full stream's decode (causal)
    q = tmp_path / "full.wav"
    q.write_bytes(_gsm_wav_bytes(payload, 960))
    xf, _ = wav.read(q)
    np.testing.assert_array_equal(x[:, :800], xf[:, :800])


def test_gsm_wav_rejects_stereo_and_bad_block(tmp_path):
    payload = b"\x00" * 130
    base = bytearray(_gsm_wav_bytes(payload, 640))
    fmt_off = bytes(base).find(b"fmt ") + 8
    bad_ch = bytearray(base)
    struct.pack_into("<H", bad_ch, fmt_off + 2, 2)
    with pytest.raises(wav.WavError):
        wav.read_bytes(bytes(bad_ch))
    bad_ba = bytearray(base)
    struct.pack_into("<H", bad_ba, fmt_off + 12, 64)
    with pytest.raises(wav.WavError):
        wav.read_bytes(bytes(bad_ba))
