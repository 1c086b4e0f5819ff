import numpy as np
import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.io import native, wav
from audio_processor_tpu.io.decode import load_audio, probe
from audio_processor_tpu.io.scanner import AudioFileScanner


def _write_call(path, data, sr=8000):
    wav.write(path, data, sr)
    return path


def test_wav_roundtrip(tmp_path, stereo_call):
    p = _write_call(tmp_path / "c.wav", stereo_call, 16000)
    x, sr = wav.read(p)
    assert sr == 16000
    assert x.shape == stereo_call.shape
    # 16-bit quantization error bound
    assert np.abs(x - stereo_call).max() < 1.0 / 32000


def test_wav_info(tmp_path, stereo_call):
    p = _write_call(tmp_path / "c.wav", stereo_call, 16000)
    ai = wav.info(p)
    assert ai.sample_rate == 16000
    assert ai.num_channels == 2
    assert ai.num_frames == stereo_call.shape[1]
    assert ai.bits_per_sample == 16


def test_wav_rejects_garbage(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file at all, sorry")
    with pytest.raises(wav.WavError):
        wav.read(p)
    assert probe(p) is None


def test_native_matches_python(tmp_path, stereo_call):
    if not native.available():
        pytest.skip("native lib not built")
    p = _write_call(tmp_path / "c.wav", stereo_call, 16000)
    x_py, sr_py = wav.read(p)
    out = native.read_wav(p)
    assert out is not None
    x_nat, sr_nat = out
    assert sr_nat == sr_py
    np.testing.assert_allclose(x_nat, x_py, atol=0)
    ai = native.probe_wav(p)
    assert ai.num_frames == stereo_call.shape[1]
    assert ai.num_channels == 2


def test_native_batch_read(tmp_path, stereo_call):
    if not native.available():
        pytest.skip("native lib not built")
    paths = []
    for i in range(5):
        paths.append(_write_call(tmp_path / f"c{i}.wav",
                                 stereo_call[:, : 1000 * (i + 1)], 16000))
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"garbage")
    paths.append(bad)
    out = native.read_wav_batch(paths, n_threads=4)
    assert len(out) == 6
    for i in range(5):
        x, sr = out[i]
        assert sr == 16000 and x.shape == (2, 1000 * (i + 1))
    assert out[5] is None


def test_load_audio_dispatch(tmp_path, stereo_call):
    p = _write_call(tmp_path / "c.wav", stereo_call, 16000)
    x, sr = load_audio(p)
    assert sr == 16000 and x.shape[0] == 2


def test_scanner_rejects_mono_and_empty(tmp_path, stereo_call):
    _write_call(tmp_path / "good.wav", stereo_call, 16000)
    _write_call(tmp_path / "mono.wav", stereo_call[0], 16000)
    empty = tmp_path / "empty.wav"
    wav.write(empty, np.zeros((2, 0), np.float32), 16000)
    (tmp_path / "junk.wav").write_bytes(b"junk")
    scanner = AudioFileScanner(PipelineConfig())
    found = scanner.scan_files_parallel(tmp_path)
    assert [f.name for f in found] == ["good.wav"]


def test_ogg_probe_vorbis_header(tmp_path):
    """Synthetic single-page OGG with a Vorbis ID header."""
    import struct
    # Vorbis ID header: magic(7) version(4) ch(1) rate(4) bitrates(12)
    # blocksizes(1) framing(1) = 30 bytes.
    ident = b"\x01vorbis" + struct.pack("<IBIiiiBB", 0, 2, 44100,
                                        0, 0, 0, 1, 1)
    page = (b"OggS" + b"\x00" + b"\x02"               # version, BOS flag
            + struct.pack("<q", 0)                    # granule
            + struct.pack("<I", 1) + struct.pack("<I", 0)
            + struct.pack("<I", 0)                    # checksum (unchecked)
            + bytes([1, len(ident)]))
    # fix segment count: 1 segment
    page = page[:26] + bytes([1, len(ident)]) + ident
    last = (b"OggS" + b"\x00" + b"\x04"
            + struct.pack("<q", 44100 * 3)            # 3 seconds
            + struct.pack("<I", 1) + struct.pack("<I", 1)
            + struct.pack("<I", 0) + bytes([0]))
    p = tmp_path / "x.ogg"
    p.write_bytes(page + last)
    ai = probe(p)
    assert ai is not None
    assert ai.num_channels == 2
    assert ai.sample_rate == 44100
    assert ai.num_frames == 44100 * 3
    assert ai.encoding == "vorbis"


OGG_SAMPLE = ("/opt/venv/lib/python3.12/site-packages/pygame/examples/"
              "data/house_lo.ogg")


def test_ogg_probe_real_file():
    import pathlib

    if not pathlib.Path(OGG_SAMPLE).exists():
        pytest.skip("no ogg sample available")
    ai = probe(OGG_SAMPLE)
    assert ai is not None
    assert ai.encoding == "vorbis"
    assert ai.sample_rate == 11025
    assert ai.num_channels == 1
    assert ai.num_frames == 78331


def test_ogg_decode_real_file():
    import pathlib

    if not pathlib.Path(OGG_SAMPLE).exists():
        pytest.skip("no ogg sample available")
    pytest.importorskip("pygame")
    x, sr = load_audio(OGG_SAMPLE)
    assert sr == 11025
    assert x.shape[0] == 1
    # SDL pads decode output to its buffer granularity; the true frame
    # count from the granule position must be covered.
    assert abs(x.shape[1] - 78331) < 2048
    assert np.abs(x).max() <= 1.0
    assert np.abs(x).max() > 0.05  # real audio, not silence


def _write_wav_custom(path, data_f32, sr, bits, fmt):
    """Hand-build WAV files in every supported encoding."""
    import struct

    x = np.asarray(data_f32)  # [C, T] in [-1, 1]
    c, nf = x.shape
    inter = x.T.reshape(-1)
    if fmt == "float":
        dt = "<f4" if bits == 32 else "<f8"
        payload = inter.astype(dt).tobytes()
        tag = 3
    elif bits == 8:
        payload = (np.clip(np.round(inter * 128.0) + 128, 0, 255)
                   .astype("<u1").tobytes())
        tag = 1
    elif bits == 16:
        payload = np.clip(np.round(inter * 32768.0), -32768, 32767) \
            .astype("<i2").tobytes()
        tag = 1
    elif bits == 24:
        vals = np.clip(np.round(inter * 8388608.0), -8388608,
                       8388607).astype(np.int64)
        b = np.zeros((vals.size, 3), np.uint8)
        u = (vals & 0xFFFFFF).astype(np.uint32)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        payload = b.tobytes()
        tag = 1
    else:  # 32-bit int
        payload = np.clip(np.round(inter * 2147483648.0), -2 ** 31,
                          2 ** 31 - 1).astype("<i4").tobytes()
        tag = 1
    bytes_per = bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, tag, c, sr,
                                      sr * c * bytes_per, c * bytes_per,
                                      bits))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)


@pytest.mark.parametrize("bits,fmt,tol", [
    (8, "int", 1 / 120.0), (16, "int", 1 / 30000.0),
    (24, "int", 1 / 8e6), (32, "int", 1e-7),
    (32, "float", 1e-7), (64, "float", 1e-7),
])
def test_wav_all_encodings(tmp_path, bits, fmt, tol):
    rng = np.random.default_rng(0)
    data = (0.8 * rng.standard_normal((2, 500))).clip(-0.99, 0.99) \
        .astype(np.float64)
    p = tmp_path / f"x_{bits}_{fmt}.wav"
    _write_wav_custom(p, data, 16000, bits, fmt)
    x, sr = wav.read(p)
    assert sr == 16000 and x.shape == (2, 500)
    assert np.abs(x - data).max() < tol
    ai = wav.info(p)
    assert ai.bits_per_sample == bits
    assert ai.num_frames == 500
    # Native fast path must agree exactly with the Python reference.
    if native.available():
        out = native.read_wav(p)
        assert out is not None
        np.testing.assert_array_equal(out[0], x)


def test_wav_extensible_format(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE wrapper around PCM16."""
    import struct

    rng = np.random.default_rng(1)
    data = (0.5 * rng.standard_normal((2, 200))).clip(-0.99, 0.99) \
        .astype(np.float64)
    inter = data.T.reshape(-1)
    payload = np.clip(np.round(inter * 32768.0), -32768, 32767) \
        .astype("<i2").tobytes()
    guid = struct.pack("<H", 1) + b"\x00\x00" + \
        bytes.fromhex("000000100080 00aa00389b71".replace(" ", ""))
    assert len(guid) == 16
    # base fmt (16) + cbSize=22 + validBits + channelMask + GUID
    fmt_chunk = struct.pack("<HHIIHH", 0xFFFE, 2, 16000, 64000, 4, 16) \
        + struct.pack("<HHI", 22, 16, 3) + guid
    p = tmp_path / "ext.wav"
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 20 + len(fmt_chunk)
                                      + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk)
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    x, sr = wav.read(p)
    assert sr == 16000 and x.shape == (2, 200)
    assert np.abs(x - data).max() < 1e-4
    if native.available():
        out = native.read_wav(p)
        np.testing.assert_array_equal(out[0], x)


def test_wav_read_range_bit_exact(tmp_path, stereo_call):
    """read_range == the same slice of a full read, bit for bit,
    including clamped / empty / open-ended ranges."""
    p = _write_call(tmp_path / "c.wav", stereo_call, 16000)
    full, sr = wav.read(p)
    T = full.shape[1]
    for s, n in [(0, 100), (1234, 4096), (T - 7, None), (T + 10, 5),
                 (50, 0), (0, None)]:
        x, r = wav.read_range(p, s, n)
        assert r == sr
        ref = full[:, min(s, T):(min(s, T) + n if n is not None
                                 else None)]
        np.testing.assert_array_equal(x, ref, err_msg=f"({s},{n})")


@pytest.mark.parametrize("bits,fmt", [(16, "int"), (24, "int"),
                                      (32, "float")])
def test_wav_read_range_all_encodings(tmp_path, bits, fmt):
    rng = np.random.default_rng(1)
    data = (0.8 * rng.standard_normal((2, 4000))).clip(-0.99, 0.99) \
        .astype(np.float64)
    p = tmp_path / f"r_{bits}_{fmt}.wav"
    _write_wav_custom(p, data, 16000, bits, fmt)
    full, _ = wav.read(p)
    x, _ = wav.read_range(p, 777, 2048)
    np.testing.assert_array_equal(x, full[:, 777:777 + 2048])


def test_load_audio_range_dispatch(tmp_path, stereo_call):
    """load_audio_range routes per container and matches the full
    decode's slice (WAV bit-exact; Vorbis bit-exact per io/vorbis
    seek decode)."""
    from audio_processor_tpu.io.decode import load_audio_range

    p = _write_call(tmp_path / "c.wav", stereo_call, 16000)
    full, sr = load_audio(p)
    x, r = load_audio_range(p, 500, 3000)
    assert r == sr
    np.testing.assert_array_equal(x, full[:, 500:3500])


def test_scanner_accepts_opus_extension(tmp_path):
    """Beyond-reference: .opus files route through the same Ogg/Opus
    chain as .ogg (scan glob + header probe + decode)."""
    pytest.importorskip("tests.opus_encoder")
    from tests.opus_encoder import encoder_available, encode_ogg_opus
    if not encoder_available():
        pytest.skip("libopus unavailable")
    import numpy as np
    from audio_processor_tpu.io.decode import load_audio, probe
    from audio_processor_tpu.io.scanner import AudioFileScanner

    t = np.arange(48000) / 48000.0
    pcm = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 660 * t)], 1).astype(np.float32)
    path = tmp_path / "call.opus"
    path.write_bytes(encode_ogg_opus(0.5 * pcm, 2))
    ai = probe(path)
    assert ai is not None and ai.num_channels == 2
    found = AudioFileScanner({}).scan_files_parallel(tmp_path)
    assert [f.name for f in found] == ["call.opus"]
    audio, sr = load_audio(path)
    assert sr == 48000 and audio.shape[0] == 2


def test_maybe_int16_wire():
    """Wire engages only on int16-exact float32 (incl. full-scale
    -32768), never changes values, and rejects NaN/inf/out-of-range."""
    from audio_processor_tpu.io.wire import maybe_int16_wire

    k = np.array([-32768, -1, 0, 1, 32767], np.int16)
    x = k.astype(np.float32) / 32768.0
    w = maybe_int16_wire(x)
    assert w.dtype == np.int16
    np.testing.assert_array_equal(w, k)
    # round-trip: dequantize matches the f32 values bit-for-bit
    np.testing.assert_array_equal(w.astype(np.float32) / 32768.0, x)

    for bad in (x + np.float32(1e-6),                  # non-exact
                np.array([1.5], np.float32),           # out of range
                np.array([np.nan], np.float32),
                np.array([np.inf], np.float32)):
        out = maybe_int16_wire(bad)
        assert out.dtype == np.float32 and out is bad
    # non-f32 input passes through untouched
    d = np.zeros(4, np.float64)
    assert maybe_int16_wire(d) is d


@pytest.mark.parametrize("law", ["alaw", "ulaw"])
def test_wav_g711_matches_audioop(tmp_path, law):
    """G.711 A-law/mu-law WAVs (telephony recorders; torchaudio/sox
    decode them via the same ITU expansion) — oracle: audioop."""
    import struct as _struct
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 256, size=2 * 400, dtype=np.uint8)
    payload = codes.tobytes()
    tag = 0x0006 if law == "alaw" else 0x0007
    p = tmp_path / f"{law}.wav"
    with open(p, "wb") as f:
        f.write(b"RIFF" + _struct.pack("<I", 36 + len(payload))
                + b"WAVE")
        f.write(b"fmt " + _struct.pack("<IHHIIHH", 16, tag, 2, 8000,
                                       16000, 2, 8))
        f.write(b"data" + _struct.pack("<I", len(payload)) + payload)

    x, sr = wav.read(p)
    assert sr == 8000 and x.shape == (2, 400)
    ai = wav.info(p)
    assert ai.encoding == f"pcm_{law}" and ai.num_frames == 400

    fn = audioop.alaw2lin if law == "alaw" else audioop.ulaw2lin
    ref = np.frombuffer(fn(payload, 2), dtype="<i2").astype(np.float32)
    ref = ref.reshape(400, 2).T / 32768.0
    np.testing.assert_array_equal(x, ref)

    # read_range agrees bit-exactly with a full-read slice.
    piece, _ = wav.read_range(p, 100, 50)
    np.testing.assert_array_equal(piece, x[:, 100:150])

    # The native fast path must decline (not mis-read) G.711.
    if native.available():
        assert native.read_wav(p) is None


@pytest.mark.parametrize("channels,block_align", [(1, 256), (2, 512)])
def test_wav_ima_adpcm_matches_audioop(tmp_path, channels, block_align):
    """IMA/DVI ADPCM WAV (tag 0x0011) vs audioop.adpcm2lin driven
    block by block with each block's header state. audioop consumes
    nibbles HIGH-first while WAV stores LOW-first, so the oracle
    repacks; expansion formulas are identical."""
    import struct as _struct
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    rng = np.random.default_rng(7)
    ch, ba = channels, block_align
    spb = (ba - 4 * ch) * 2 // ch + 1
    n_blocks = 5
    blocks = []
    for _ in range(n_blocks):
        blk = bytearray()
        for c in range(ch):
            pred = int(rng.integers(-32768, 32768))
            idx = int(rng.integers(0, 89))
            blk += _struct.pack("<hBB", pred, idx, 0)
        blk += bytes(rng.integers(0, 256, size=ba - 4 * ch,
                                  dtype=np.uint8))
        blocks.append(bytes(blk))
    payload = b"".join(blocks)
    total = n_blocks * spb - 3          # fact trims a few frames
    p = tmp_path / f"ima_{ch}.wav"
    with open(p, "wb") as f:
        f.write(b"RIFF" + _struct.pack("<I", 52 + len(payload))
                + b"WAVE")
        f.write(b"fmt " + _struct.pack("<IHHIIHHHH", 20, 0x0011, ch,
                                       8000, 8000 * ba // (spb * ch),
                                       ba, 4, 2, spb))
        f.write(b"fact" + _struct.pack("<II", 4, total))
        f.write(b"data" + _struct.pack("<I", len(payload)) + payload)

    x, sr = wav.read(p)
    assert sr == 8000 and x.shape == (ch, total)
    ai = wav.info(p)
    assert ai.encoding == "adpcm_ima" and ai.num_frames == total

    # Oracle: per block, per channel.
    got = np.round(x * 32768.0).astype(np.int32)
    for b, blk in enumerate(blocks):
        for c in range(ch):
            pred, idx, _ = _struct.unpack_from("<hBB", blk, 4 * c)
            data = np.frombuffer(blk[4 * ch:], np.uint8) \
                .reshape(-1, ch, 4)[:, c].reshape(-1)
            lo, hi = data & 0x0F, data >> 4
            nibs = np.stack([lo, hi], -1).reshape(-1)
            repacked = ((nibs[0::2] << 4) | nibs[1::2]) \
                .astype(np.uint8).tobytes()
            dec, _state = audioop.adpcm2lin(repacked, 2, (pred, idx))
            ref = np.concatenate([
                [pred], np.frombuffer(dec, "<i2")])[:spb]
            start = b * spb
            want = ref[:max(0, min(spb, total - start))]
            np.testing.assert_array_equal(
                got[c, start:start + len(want)], want,
                err_msg=f"block {b} ch {c}")

    piece, _ = wav.read_range(p, spb - 2, 7)
    np.testing.assert_array_equal(piece, x[:, spb - 2:spb + 5])
    if native.available():
        assert native.read_wav(p) is None


def _make_ms_adpcm_wav(rng, ch, block_align, n_blocks, sr=8000,
                       trim=0, declared_spb=None):
    """Random-but-structurally-valid MS ADPCM WAV bytes + block list.

    Random headers (predictor 0-6, iDelta incl. the <16 and negative
    edges) and random nibble payloads stress every decode branch; SDL
    decodes whatever is structurally valid, so no encoder is needed."""
    import struct as _struct

    ba = block_align
    spb = _spb_ms(ch, ba)
    assert ch * 7 + ((spb - 2) * ch + 1) // 2 == ba
    blocks = []
    for _ in range(n_blocks):
        blk = bytearray()
        for _c in range(ch):
            blk.append(int(rng.integers(0, 7)))
        for _c in range(ch):
            # header iDelta >= 0: negative values hit a region where
            # real decoders disagree (SDL reads it unsigned)
            blk += _struct.pack("<h", int(rng.integers(0, 4000)))
        for _c in range(2 * ch):
            blk += _struct.pack("<h", int(rng.integers(-30000, 30000)))
        blk += bytes(rng.integers(0, 256, size=ba - 7 * ch,
                                  dtype=np.uint8))
        blocks.append(bytes(blk))
    payload = b"".join(blocks)
    total = n_blocks * spb - trim
    fmt = _struct.pack("<HHIIHHHHH", 0x0002, ch, sr,
                       sr * ba // spb, ba, 4, 32,
                       declared_spb or spb, 7)
    for c1, c2 in ((256, 0), (512, -256), (0, 0), (192, 64),
                   (240, 0), (460, -208), (392, -232)):
        fmt += _struct.pack("<hh", c1, c2)
    out = (b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4
                                  + 8 + len(payload)) + b"WAVE"
           + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
           + b"fact" + _struct.pack("<II", 4, total)
           + b"data" + _struct.pack("<I", len(payload)) + payload)
    return out, total, spb


def _spb_ms(ch, block_align):
    return (block_align - 7 * ch) * 2 // ch + 2


def _sdl_decode_wav(path, sr, ch):
    from tests.sdl_oracle import sdl_decode

    return sdl_decode(path, sr, ch)


@pytest.mark.parametrize("channels,block_align", [(1, 256), (2, 512),
                                                  (1, 71), (2, 338)])
def test_wav_ms_adpcm_matches_sdl(tmp_path, channels, block_align):
    """MS ADPCM WAV (tag 0x0002) vs pygame's SDL WAV loader on random
    structurally-valid blocks (predictors 0-6, iDelta down past the
    16 floor, random nibbles): bit-exact, including the trunc-toward-
    zero /256 predictor and the post-adaptation >=16 delta floor."""
    rng = np.random.default_rng(11 + channels + block_align)
    data, total, spb = _make_ms_adpcm_wav(rng, channels, block_align,
                                          n_blocks=6, trim=3)
    p = tmp_path / f"ms_{channels}_{block_align}.wav"
    p.write_bytes(data)

    ai = wav.info(p)
    assert ai.encoding == "adpcm_ms"
    assert ai.num_frames == total
    x, sr = wav.read(p)
    assert sr == 8000 and x.shape == (channels, total)

    oracle = _sdl_decode_wav(p, 8000, channels)
    if oracle is None:
        pytest.skip("SDL audio unavailable")
    got = np.round(x * 32768.0).astype(np.int64)
    n = min(oracle.shape[1], total)
    assert n >= total - 1
    np.testing.assert_array_equal(got[:, :n],
                                  oracle[:, :n].astype(np.int64))

    # Random access: block-aligned fetch + local slice, bit-identical.
    piece, _ = wav.read_range(p, spb - 2, 9)
    np.testing.assert_array_equal(piece, x[:, spb - 2:spb + 7])
    if native.available():
        assert native.read_wav(p) is None  # native declines -> Python


def test_wav_ms_adpcm_extensible_wrapper(tmp_path):
    """An EXTENSIBLE fmt wrapping sub-format 0x0002 must not parse
    the wrapper fields (wValidBitsPerSample/dwChannelMask) as the MS
    ADPCM extension — geometry falls back to block-align-derived
    defaults and the decode matches the plain-tag file."""
    import struct as _struct

    rng = np.random.default_rng(21)
    data, total, spb = _make_ms_adpcm_wav(rng, 2, 512, n_blocks=4)
    p_plain = tmp_path / "plain.wav"
    p_plain.write_bytes(data)
    x_plain, _ = wav.read(p_plain)

    # rebuild with an EXTENSIBLE fmt chunk (cbSize=22 layout)
    data_off = data.find(b"data")
    payload = data[data_off + 8:]
    fmt = _struct.pack("<HHIIHH", 0xFFFE, 2, 8000, 8000 * 512 // spb,
                       512, 4)
    fmt += _struct.pack("<HHI", 22, 4, 0x3)        # valid bits, mask
    fmt += _struct.pack("<H", 0x0002) + b"\x00\x00" + \
        b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    ext = (b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + 12 + 8
                                  + len(payload)) + b"WAVE"
           + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
           + b"fact" + _struct.pack("<II", 4, total)
           + b"data" + _struct.pack("<I", len(payload)) + payload)
    p_ext = tmp_path / "ext.wav"
    p_ext.write_bytes(ext)
    ai = wav.info(p_ext)
    assert ai.encoding == "adpcm_ms" and ai.num_frames == total
    x_ext, _ = wav.read(p_ext)
    np.testing.assert_array_equal(x_ext, x_plain)


def test_wav_ms_adpcm_partial_trailing_block(tmp_path):
    """A mid-block truncation decodes the recoverable prefix: header
    frames + whole payload bytes, matching the untruncated file."""
    rng = np.random.default_rng(5)
    data, total, spb = _make_ms_adpcm_wav(rng, 2, 512, n_blocks=4)
    p_full = tmp_path / "full.wav"
    p_full.write_bytes(data)
    x_full, _ = wav.read(p_full)

    import struct as _struct

    ba = 512
    cut = 3 * ba + 7 * 2 + 40            # 40 payload bytes into blk 3
    data_off = data.find(b"data") + 8
    body = data[data_off:data_off + cut]
    head = bytearray(data[:data_off])
    _struct.pack_into("<I", head, data_off - 4, len(body))
    # drop the fact chunk's trim so only the truncation bounds frames
    fact_off = data.find(b"fact") + 8
    _struct.pack_into("<I", head, fact_off, 0xFFFFFFFF)
    p_cut = tmp_path / "cut.wav"
    p_cut.write_bytes(bytes(head) + body)

    want = 3 * spb + 2 + 40 * 2 // 2
    ai = wav.info(p_cut)
    assert ai.num_frames == want
    x_cut, _ = wav.read(p_cut)
    assert x_cut.shape == (2, want)
    np.testing.assert_array_equal(x_cut, x_full[:, :want])


def test_float_wav_nonfinite_samples_zeroed(tmp_path):
    """NaN/Inf bit patterns in float WAV payloads decode to 0 in BOTH
    readers (finite samples untouched) so a corrupt file can't poison
    its device batch with non-finite values."""
    x = np.array([[0.5, np.nan, -0.25, np.inf, 0.125, -np.inf]],
                 np.float64)
    for bits in (32, 64):
        p = tmp_path / f"nf{bits}.wav"
        _write_wav_custom(p, x, 8000, bits, "float")
        got, _ = wav.read(p)
        np.testing.assert_array_equal(
            got[0], [0.5, 0.0, -0.25, 0.0, 0.125, 0.0])
        if native.available():
            out = native.read_wav(p)
            if out is not None:
                np.testing.assert_array_equal(
                    out[0][0], [0.5, 0.0, -0.25, 0.0, 0.125, 0.0])


def test_wav_header_corruption_fuzz(tmp_path):
    """Random header/payload corruption across every format branch
    (PCM 8/16/24/32, float, G.711, IMA ADPCM): read() must decode or
    raise a clean error — never crash, hang, or return NaN/inf."""
    import struct as _struct

    rng = np.random.default_rng(99)
    fixtures = []
    pcm = (0.5 * rng.standard_normal((2, 300))).astype(np.float64)
    for bits, fmt in [(8, "int"), (16, "int"), (24, "int"),
                      (32, "int"), (32, "float")]:
        p = tmp_path / f"f_{bits}_{fmt}.wav"
        _write_wav_custom(p, pcm, 8000, bits, fmt)
        fixtures.append(p.read_bytes())
    for tag in (0x0006, 0x0007):
        payload = rng.integers(0, 256, 600, dtype=np.uint8).tobytes()
        fixtures.append(
            b"RIFF" + _struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt " + _struct.pack("<IHHIIHH", 16, tag, 2, 8000,
                                     16000, 2, 8)
            + b"data" + _struct.pack("<I", len(payload)) + payload)
    blk = (_struct.pack("<hBBhBB", 100, 30, 0, -100, 60, 0)
           + rng.integers(0, 256, 504, dtype=np.uint8).tobytes())
    fixtures.append(
        b"RIFF" + _struct.pack("<I", 36 + len(blk)) + b"WAVE"
        + b"fmt " + _struct.pack("<IHHIIHHHH", 20, 0x0011, 2, 8000,
                                 4000, 512, 4, 2, 505)
        + b"data" + _struct.pack("<I", len(blk)) + blk)
    ms_data, _, _ = _make_ms_adpcm_wav(np.random.default_rng(3), 2,
                                       512, n_blocks=2)
    fixtures.append(ms_data)
    gsm_payload = rng.integers(0, 256, 65 * 3, dtype=np.uint8).tobytes()
    fixtures.append(
        b"RIFF" + _struct.pack("<I", 56 + len(gsm_payload)) + b"WAVE"
        + b"fmt " + _struct.pack("<IHHIIHHHH", 20, 0x0031, 1, 8000,
                                 1625, 65, 0, 2, 320)
        + b"data" + _struct.pack("<I", len(gsm_payload)) + gsm_payload)

    ran = 0
    for trial in range(400):
        base = bytearray(fixtures[trial % len(fixtures)])
        kind = trial % 4
        if kind == 0:    # flip bytes in the header region
            for _ in range(rng.integers(1, 6)):
                base[int(rng.integers(0, min(64, len(base))))] = \
                    int(rng.integers(0, 256))
        elif kind == 1:  # flip bytes anywhere
            for _ in range(rng.integers(1, 9)):
                base[int(rng.integers(0, len(base)))] = \
                    int(rng.integers(0, 256))
        elif kind == 2:  # truncate
            base = base[:int(rng.integers(0, len(base)))]
        else:            # extend with junk
            base += bytes(rng.integers(0, 256, 64, dtype=np.uint8))
        try:
            x, sr = wav.read_bytes(bytes(base))
            assert np.isfinite(x).all()
            assert sr > 0
        except (wav.WavError, ValueError, EOFError):
            pass
        ran += 1
    assert ran == 400
