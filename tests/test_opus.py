"""Ogg/Opus decode (io/opus.py) validated against an independent
libopus *encoder* fixture (tests/opus_encoder.py).

Reference behavior replaced: ffmpeg-subprocess decode of non-Vorbis
.ogg payloads (services/audio_processor.py:76-86) — here fully
in-process (first-party Ogg layer + system libopus via ctypes).
"""

import struct

import numpy as np
import pytest

from audio_processor_tpu.io import opus as opus_mod

try:
    from tests.opus_encoder import (encode_ogg_opus, encoder_available,
                                    opus_head, opus_tags)
except Exception:  # pragma: no cover
    encoder_available = lambda: False  # noqa: E731

pytestmark = pytest.mark.skipif(
    not (opus_mod.available() and encoder_available()),
    reason="libopus not available in this image")

SR = 48000


def _sine_pcm(n, channels, freqs=(440.0, 1230.0)):
    t = np.arange(n) / SR
    cols = [0.5 * np.sin(2 * np.pi * freqs[c % len(freqs)] * t
                         + 0.1 * c)
            for c in range(channels)]
    return np.stack(cols, axis=1).astype(np.float32)


def _corr(a, b):
    a = a - a.mean()
    b = b - b.mean()
    den = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / den) if den else 0.0


@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_length_and_fidelity(channels):
    n = SR  # 1 s
    pcm = _sine_pcm(n, channels)
    data = encode_ogg_opus(pcm, channels)
    out, rate = opus_mod.decode_opus(data)
    assert rate == SR
    assert out.shape == (channels, n)  # pre-skip + end-trim exact
    # Lossy codec: require high correlation on band-limited content,
    # ignoring the first/last 10 ms (codec warm-up transient).
    for c in range(channels):
        assert _corr(out[c, 480:-480], pcm[480:-480, c]) > 0.97


def test_output_gain_applied():
    pcm = _sine_pcm(SR // 2, 1)
    flat = encode_ogg_opus(pcm, 1, gain_q8=0)
    # Patch a +6.02 dB output gain (q7.8 value 1541) into OpusHead:
    # decode must scale by ~2x (RFC 7845 section 5.1).
    gain = int(round(np.log10(2.0) * 20 * 256))
    out0, _ = opus_mod.decode_opus(flat)
    boosted = encode_ogg_opus(pcm, 1, gain_q8=gain)
    out2, _ = opus_mod.decode_opus(boosted)
    r0 = np.sqrt((out0 ** 2).mean())
    r2 = np.sqrt((out2 ** 2).mean())
    assert 1.9 < r2 / r0 < 2.1


def test_multistream_mapping_family1():
    """Family-1 stereo (stream_count=1, coupled=1, mapping [0,1])
    decodes through the multistream API to the same samples as the
    equivalent family-0 stream."""
    from tests.vorbis_encoder import ogg_page

    pcm = _sine_pcm(SR // 2, 2)
    data = encode_ogg_opus(pcm, 2)
    ref, _ = opus_mod.decode_opus(data)

    # Rebuild the stream with a family-1 head, same audio packets.
    pkts = list(opus_mod._ogg_opus_packets(data))
    head0 = opus_mod.OpusHead(pkts[0][0])
    fam1_head = (b"OpusHead" + bytes([1, 2])
                 + struct.pack("<HIh", head0.pre_skip, SR, 0)
                 + bytes([1, 1, 1, 0, 1]))  # family 1, 1 stream 1 coupled
    serial = 99
    pages = [ogg_page([fam1_head], serial, 0, 0, 0x2),
             ogg_page([opus_tags()], serial, 1, 0, 0x0)]
    audio = pkts[2:]
    granule = max(g for _, g in audio if g is not None)
    pages.append(ogg_page([p for p, _ in audio], serial, 2, granule,
                          0x4))
    out, rate = opus_mod.decode_opus(b"".join(pages))
    assert rate == SR
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_head_parse_errors():
    with pytest.raises(opus_mod.OpusError):
        opus_mod.OpusHead(b"NotOpus!" + b"\x00" * 16)
    with pytest.raises(opus_mod.OpusError):
        opus_mod.OpusHead(opus_head(3, 0))  # 3 ch in family 0
    # Version major != 0 rejected.
    bad = bytearray(opus_head(1, 0))
    bad[8] = 0x20
    with pytest.raises(opus_mod.OpusError):
        opus_mod.OpusHead(bytes(bad))
    # Family-1 mapping index out of range.
    fam1 = (b"OpusHead" + bytes([1, 2]) + struct.pack("<HIh", 0, SR, 0)
            + bytes([1, 1, 0, 0, 7]))
    with pytest.raises(opus_mod.OpusError):
        opus_mod.OpusHead(fam1)


def test_load_audio_routes_opus(tmp_path):
    from audio_processor_tpu.io.decode import load_audio, load_audio_bytes
    from audio_processor_tpu.io.ogg import probe_ogg

    pcm = _sine_pcm(SR // 2, 2)
    data = encode_ogg_opus(pcm, 2)
    p = tmp_path / "call.ogg"
    p.write_bytes(data)

    info = probe_ogg(p)
    assert info is not None and info.encoding == "opus"
    assert info.num_channels == 2 and info.sample_rate == SR
    assert info.num_frames == pcm.shape[0]

    out, rate = load_audio(p)
    assert rate == SR and out.shape == (2, pcm.shape[0])

    out_b, rate_b = load_audio_bytes(data)
    np.testing.assert_array_equal(out_b, out)
    assert rate_b == SR


def test_truncated_stream_raises():
    pcm = _sine_pcm(SR // 4, 1)
    data = encode_ogg_opus(pcm, 1)
    with pytest.raises(opus_mod.OpusError):
        opus_mod.decode_opus(data[:50])  # mid-OpusHead page


# ------------------------------------------------------------------
# Robustness: a corrupted/truncated Ogg/Opus stream must yield a clean
# OpusError (or a clean decode) — never a crash, hang, or a leaked
# internal exception type. Runs in a subprocess so a segfault in the
# ctypes/libopus boundary would fail the test instead of pytest.
# (Mirrors the Vorbis corruption sweep, tests/test_vorbis.py.)
# ------------------------------------------------------------------

_FUZZ_DRIVER = r"""
import sys
import numpy as np
from audio_processor_tpu.io import opus as opus_mod

sample_path, n_variants = sys.argv[1], int(sys.argv[2])
data = bytearray(open(sample_path, "rb").read())
rng = np.random.default_rng(99)
ran = 0
for k in range(n_variants):
    buf = bytearray(data)
    kind = k % 4
    if kind == 0:    # flip bytes in the header pages (OpusHead/Tags)
        for _ in range(rng.integers(1, 8)):
            buf[int(rng.integers(0, min(200, len(buf))))] = int(
                rng.integers(0, 256))
    elif kind == 1:  # flip bytes anywhere (audio packets, granules)
        for _ in range(rng.integers(1, 32)):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
    elif kind == 2:  # truncate
        buf = buf[: int(rng.integers(1, len(buf)))]
    else:            # random garbage behind a valid OggS magic
        n = int(rng.integers(32, 8192))
        buf = bytearray(b"OggS") + bytearray(
            rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    try:
        out, sr = opus_mod.decode_opus(bytes(buf))
        assert sr == 48000 and out.ndim == 2
    except opus_mod.OpusError:
        pass  # the one sanctioned failure mode
    ran += 1
print(f"opus-fuzz-ok {ran}")
"""


def test_decode_survives_corrupt_streams(tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    pcm = _sine_pcm(SR // 2, 2)
    sample = tmp_path / "sample.ogg"
    sample.write_bytes(encode_ogg_opus(pcm, 2))
    r = subprocess.run(
        [sys.executable, "-c", _FUZZ_DRIVER, str(sample), "300"],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).resolve().parent.parent)
    assert r.returncode == 0, (
        f"opus decode crashed/leaked on corrupt input:\n"
        f"{r.stdout}\n{r.stderr}")
    assert "opus-fuzz-ok 300" in r.stdout


def test_streaming_decode_equals_eager():
    """decode_opus_stream blocks concatenate to exactly the eager
    decode (pre-skip, end-granule trim, and output gain included)."""
    pcm_in = _sine_pcm(int(SR * 1.7), 2)
    data = encode_ogg_opus(pcm_in, 2)
    full, sr = opus_mod.decode_opus(data)
    sr2, blocks = opus_mod.decode_opus_stream(data)
    blocks = list(blocks)
    assert sr2 == sr == 48000
    assert len(blocks) > 4
    np.testing.assert_array_equal(np.concatenate(blocks, axis=1), full)


def test_range_decode_matches_full_slice():
    """decode_opus_range == the same slice of a full decode to float
    tolerance (fresh decoder + 480 ms pre-roll; RFC 7845 §4.4 floor
    is 80 ms), with exact shapes/positions from the TOC-byte packet
    index."""
    pcm_in = _sine_pcm(int(SR * 3.0), 2)
    data = encode_ogg_opus(pcm_in, 2)
    full, sr = opus_mod.decode_opus(data)
    T = full.shape[1]
    for s, n in [(0, 1000), (5000, 2000), (T // 2, 4800),
                 (T - 1000, None), (T + 5, 3), (7, 0)]:
        pcm, r = opus_mod.decode_opus_range(data, s, n)
        assert r == sr
        ref = full[:, s:(s + n if n is not None else None)] \
            if s <= T else full[:, :0]
        assert pcm.shape == ref.shape, (s, n)
        if ref.size:
            np.testing.assert_allclose(pcm, ref, atol=1e-4,
                                       err_msg=f"({s},{n})")
    # A seek from 0 decodes from the first packet: bit-exact.
    pcm0, _ = opus_mod.decode_opus_range(data, 0, 1000)
    np.testing.assert_array_equal(pcm0, full[:, :1000])


def test_multistream_mapping_family255(monkeypatch):
    """Family 255 ("no defined meaning", RFC 7845 section 5.1.1.3)
    parses and decodes like family 1 through BOTH the libopus path
    and the first-party fallback; a 255 mapping entry yields a
    silent output channel."""
    from tests.vorbis_encoder import ogg_page

    pcm = _sine_pcm(SR // 2, 2)
    data = encode_ogg_opus(pcm, 2)
    ref, _ = opus_mod.decode_opus(data)

    # Same audio packets under a 3-channel family-255 head:
    # out ch0/ch1 <- the coupled pair, ch2 <- silence.
    pkts = list(opus_mod._ogg_opus_packets(data))
    head0 = opus_mod.OpusHead(pkts[0][0])
    fam255_head = (b"OpusHead" + bytes([1, 3])
                   + struct.pack("<HIh", head0.pre_skip, SR, 0)
                   + bytes([255, 1, 1, 0, 1, 255]))
    serial = 98
    pages = [ogg_page([fam255_head], serial, 0, 0, 0x2),
             ogg_page([opus_tags()], serial, 1, 0, 0x0)]
    audio = pkts[2:]
    granule = max(g for _, g in audio if g is not None)
    pages.append(ogg_page([p for p, _ in audio], serial, 2, granule,
                          0x4))
    stream = b"".join(pages)

    out, rate = opus_mod.decode_opus(stream)
    assert rate == SR
    assert out.shape[0] == 3
    np.testing.assert_allclose(out[:2], ref, atol=1e-6)
    assert not out[2].any()

    # Fallback (first-party decoder) sees the same stream.
    monkeypatch.setattr(opus_mod, "_load", lambda: None)
    out_fb, rate_fb = opus_mod.decode_opus(stream)
    assert rate_fb == SR and out_fb.shape == out.shape
    np.testing.assert_allclose(out_fb[:2], ref, atol=2e-4)
    assert not out_fb[2].any()


def test_chained_streams_decode_end_to_end():
    """RFC 7845 section 4 chains (concatenated logical streams — the
    reference's ffmpeg mechanism plays these seamlessly): decode_opus
    appends the chains, each with its own pre-skip/granule trim."""
    pcm1 = _sine_pcm(SR // 2, 2)
    pcm2 = _sine_pcm(SR // 4, 2, freqs=(880.0, 660.0))
    a = encode_ogg_opus(pcm1, 2)
    b = encode_ogg_opus(pcm2, 2)
    ref_a, _ = opus_mod.decode_opus(a)
    ref_b, _ = opus_mod.decode_opus(b)

    out, rate = opus_mod.decode_opus(a + b)
    assert rate == SR
    assert out.shape == (2, ref_a.shape[1] + ref_b.shape[1])
    np.testing.assert_array_equal(out[:, :ref_a.shape[1]], ref_a)
    np.testing.assert_array_equal(out[:, ref_a.shape[1]:], ref_b)

    # Streaming path yields the identical concatenation.
    rate2, blocks = opus_mod.decode_opus_stream(a + b)
    streamed = np.concatenate(list(blocks), axis=1)
    np.testing.assert_array_equal(streamed, out)

    # Range decode on a chained file: full-decode fallback slice.
    lo = ref_a.shape[1] - 100
    piece, _ = opus_mod.decode_opus_range(a + b, lo, 200)
    np.testing.assert_array_equal(piece, out[:, lo:lo + 200])


def test_chained_streams_channel_conform():
    """A mono chain after a stereo chain duplicates up to stereo;
    grouped (concurrent) BOS pages are NOT treated as chains."""
    st = encode_ogg_opus(_sine_pcm(SR // 4, 2), 2)
    mo = encode_ogg_opus(_sine_pcm(SR // 4, 1), 1)
    ref_st, _ = opus_mod.decode_opus(st)
    ref_mo, _ = opus_mod.decode_opus(mo)

    out, _ = opus_mod.decode_opus(st + mo)
    assert out.shape[0] == 2
    tail = out[:, ref_st.shape[1]:]
    np.testing.assert_array_equal(tail[0], ref_mo[0])
    np.testing.assert_array_equal(tail[1], ref_mo[0])

    # Single stream must still decode identically (1 segment).
    again, _ = opus_mod.decode_opus(st)
    np.testing.assert_array_equal(again, ref_st)
