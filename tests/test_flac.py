"""FLAC decoder tests: losslessness across the full bitstream matrix
(first-party encoder, sample-exact by construction), SDL/dr_flac
cross-check on the same fixtures, CRC/MD5 integrity, Ogg-FLAC mapping,
and the unified decode/probe wiring."""

import numpy as np
import pytest

from audio_processor_tpu.io.flac import (
    FlacError,
    decode_flac,
    probe_flac,
)
from tests.flac_encoder import encode_flac, encode_ogg_flac


def _sig(n, ch, bps, seed=0, smooth=True):
    """Deterministic test signal: smooth ramps + tones (so FIXED/LPC
    predictors actually predict) with full-scale excursions."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    amp = (1 << (bps - 1)) - 1
    chans = []
    for c in range(ch):
        x = (0.6 * np.sin(2 * np.pi * (0.003 + 0.002 * c) * t)
             + 0.3 * np.sin(2 * np.pi * 0.05 * t + c))
        if smooth:
            x += 0.02 * rng.standard_normal(n)
        else:
            x = rng.uniform(-1, 1, n)
        chans.append(np.clip(np.round(x * amp), -amp - 1, amp))
    return np.stack(chans, axis=1).astype(np.int64)


def _roundtrip(samples, rate, bps, **kw):
    data = encode_flac(samples, rate, bps, **kw)
    pcm, sr = decode_flac(data)
    assert sr == rate
    assert pcm.shape == (samples.shape[1], samples.shape[0])
    ints = np.round(pcm.T * (1 << (bps - 1))).astype(np.int64)
    np.testing.assert_array_equal(ints, samples)
    return data


@pytest.mark.parametrize("plan", [
    "verbatim", ("fixed", 0), ("fixed", 1), ("fixed", 2),
    ("fixed", 3), ("fixed", 4), ("lpc", 1, 10), ("lpc", 4, 12),
    ("lpc", 8, 14), ("lpc", 32, 12),
])
def test_subframe_types_lossless(plan):
    x = _sig(2048, 1, 16, seed=hash(str(plan)) % 1000)
    _roundtrip(x, 16000, 16, block_size=512, plan=plan)


def test_constant_subframe():
    x = np.full((1024, 1), -1234, np.int64)
    _roundtrip(x, 8000, 16, block_size=256, plan="constant")


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_stereo_modes_lossless(mode):
    x = _sig(1536, 2, 16, seed=7)
    # correlated channels (stereo decorrelation's target case)
    x[:, 1] = (x[:, 0] >> 1) + (x[:, 1] >> 3)
    _roundtrip(x, 8000, 16, block_size=512, ch_mode=mode,
               plan=("lpc", 4, 12))


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths_lossless(bps):
    x = _sig(1024, 2, bps, seed=bps)
    _roundtrip(x, 48000, bps, block_size=256, plan=("fixed", 2))


@pytest.mark.parametrize("po", [0, 1, 3, 5])
def test_partition_orders(po):
    x = _sig(4096, 1, 16, seed=po)
    _roundtrip(x, 44100, 16, block_size=2048, plan=("fixed", 2),
               part_order=po)


def test_rice2_and_escape_partitions():
    x = _sig(2048, 1, 16, seed=3, smooth=False)  # noisy -> big residuals
    _roundtrip(x, 16000, 16, block_size=1024, plan=("fixed", 1),
               part_order=2, rice2=True, escape_parts=(1, 3))


def test_wasted_bits():
    x = _sig(1024, 1, 16, seed=5) & ~np.int64(7)  # 3 zero low bits
    _roundtrip(x, 8000, 16, block_size=512, plan=("fixed", 2),
               wasted=3)


def test_odd_block_size_and_tail_frame():
    # 700 not a coded block size -> 16-bit explicit; 1700 % 700 leaves
    # a 300-sample tail frame (8-bit explicit size path)
    x = _sig(1700, 1, 16, seed=11)
    _roundtrip(x, 22050, 16, block_size=700, plan=("fixed", 1))


def test_uncommon_sample_rate_uses_streaminfo():
    x = _sig(512, 1, 16, seed=13)
    _roundtrip(x, 11025, 16, block_size=256, plan="verbatim")


def test_extra_metadata_blocks_skipped():
    x = _sig(512, 1, 16, seed=17)
    _roundtrip(x, 16000, 16, block_size=256, plan=("fixed", 2),
               extra_metadata=True)


def test_mixed_plans_per_channel():
    x = _sig(1024, 2, 16, seed=19)
    _roundtrip(x, 16000, 16, block_size=512,
               plan=[("fixed", 3), ("lpc", 6, 13)])


def test_frame_numbers_multi_frame():
    # >128 frames exercises the multi-byte UTF-8 coded frame number
    x = _sig(192 * 140, 1, 16, seed=23)
    _roundtrip(x, 8000, 16, block_size=192, plan=("fixed", 1))


# ------------------------------------------------------- integrity

def test_header_crc8_mismatch_raises():
    x = _sig(512, 1, 16, seed=29)
    data = bytearray(encode_flac(x, 8000, 16, block_size=512,
                                 plan="verbatim"))
    # STREAMINFO block = 4 (fLaC) + 4 (hdr) + 34; frame starts at 42;
    # corrupt a frame-header byte past the sync
    data[42 + 2] ^= 0x01
    with pytest.raises(FlacError):
        decode_flac(bytes(data))


def test_frame_crc16_mismatch_raises():
    x = _sig(512, 1, 16, seed=31)
    data = bytearray(encode_flac(x, 8000, 16, block_size=512,
                                 plan="verbatim"))
    data[-3] ^= 0x40                     # inside the subframe payload
    with pytest.raises(FlacError):
        decode_flac(bytes(data))


def test_md5_mismatch_raises():
    x = _sig(512, 1, 16, seed=37)
    data = bytearray(encode_flac(x, 8000, 16, block_size=512,
                                 plan="verbatim"))
    data[26] ^= 0xFF                     # MD5 bytes live at 26..41
    with pytest.raises(FlacError, match="MD5"):
        decode_flac(bytes(data))


def test_not_flac_raises():
    with pytest.raises(FlacError):
        decode_flac(b"RIFF" + b"\x00" * 64)


def test_probe_flac():
    x = _sig(1000, 2, 24, seed=41)
    data = encode_flac(x, 44100, 24, block_size=256, plan=("fixed", 1))
    info = probe_flac(data)
    assert info.sample_rate == 44100
    assert info.num_frames == 1000
    assert info.num_channels == 2
    assert info.bits_per_sample == 24
    assert info.encoding == "flac"


# -------------------------------------------------------- Ogg-FLAC

def test_ogg_flac_roundtrip():
    x = _sig(3000, 2, 16, seed=43)
    data = encode_ogg_flac(x, 16000, 16, block_size=1024,
                           ch_mode="mid_side", plan=("lpc", 4, 12))
    pcm, sr = decode_flac(data)
    assert sr == 16000
    ints = np.round(pcm.T * 32768).astype(np.int64)
    np.testing.assert_array_equal(ints, x)


def test_ogg_flac_chained():
    a = _sig(1024, 1, 16, seed=47)
    b = _sig(512, 1, 16, seed=53)
    data = (encode_ogg_flac(a, 8000, 16, block_size=512, serial=1)
            + encode_ogg_flac(b, 8000, 16, block_size=512, serial=2))
    pcm, sr = decode_flac(data)
    assert sr == 8000
    ints = np.round(pcm.T * 32768).astype(np.int64)
    np.testing.assert_array_equal(ints, np.concatenate([a, b]))


# ---------------------------------------------- independent oracle

def test_sdl_oracle_agrees(tmp_path):
    """Sample-exact agreement with SDL_mixer's dr_flac on a stream
    exercising every stereo mode and several subframe types."""
    from tests.sdl_oracle import sdl_decode

    segs = []
    for i, (mode, plan) in enumerate([
            ("independent", "verbatim"), ("left_side", ("fixed", 2)),
            ("right_side", ("lpc", 4, 12)), ("mid_side", ("fixed", 4))]):
        segs.append((mode, plan, _sig(2048, 2, 16, seed=60 + i)))
    for mode, plan, x in segs:
        data = encode_flac(x, 16000, 16, block_size=1024,
                           ch_mode=mode, plan=plan, part_order=1)
        f = tmp_path / f"{mode}.flac"
        f.write_bytes(data)
        oracle = sdl_decode(f, 16000, 2)
        if oracle is None:
            pytest.skip("SDL has no FLAC decoder in this image")
        pcm, sr = decode_flac(data)
        ours = np.round(pcm * 32768).astype(np.int64)
        np.testing.assert_array_equal(ours, oracle.astype(np.int64),
                                      err_msg=f"{mode}/{plan}")


# ------------------------------------------------- pipeline wiring

def test_load_audio_and_probe_flac(tmp_path):
    from audio_processor_tpu.io.decode import load_audio, probe

    x = _sig(2000, 2, 16, seed=71)
    f = tmp_path / "call.flac"
    f.write_bytes(encode_flac(x, 8000, 16, block_size=512,
                              ch_mode="mid_side", plan=("fixed", 2)))
    pcm, sr = load_audio(f)
    assert sr == 8000 and pcm.shape == (2, 2000)
    np.testing.assert_array_equal(
        np.round(pcm.T * 32768).astype(np.int64), x)
    info = probe(f)
    assert info is not None and info.num_channels == 2


def test_load_audio_bytes_flac():
    from audio_processor_tpu.io.decode import load_audio_bytes

    x = _sig(1000, 1, 16, seed=73)
    pcm, sr = load_audio_bytes(encode_flac(x, 16000, 16,
                                           block_size=256,
                                           plan=("fixed", 1)))
    assert sr == 16000
    np.testing.assert_array_equal(
        np.round(pcm.T * 32768).astype(np.int64), x)


def test_scanner_accepts_flac(tmp_path):
    from audio_processor_tpu.io.scanner import AudioFileScanner

    x = _sig(2000, 2, 16, seed=79)
    (tmp_path / "a.flac").write_bytes(
        encode_flac(x, 8000, 16, block_size=512, plan=("fixed", 2)))
    mono = _sig(2000, 1, 16, seed=83)
    (tmp_path / "mono.flac").write_bytes(
        encode_flac(mono, 8000, 16, block_size=512, plan=("fixed", 2)))
    found = AudioFileScanner({}).scan_files_parallel(tmp_path)
    assert [f.name for f in found] == ["a.flac"]


def test_ogg_flac_payload_routed(tmp_path):
    """.ogg files with a FLAC payload route through the FLAC decoder."""
    from audio_processor_tpu.io.decode import load_audio

    x = _sig(1500, 2, 16, seed=89)
    f = tmp_path / "call.ogg"
    f.write_bytes(encode_ogg_flac(x, 16000, 16, block_size=512))
    pcm, sr = load_audio(f)
    assert sr == 16000
    np.testing.assert_array_equal(
        np.round(pcm.T * 32768).astype(np.int64), x)


# ------------------------------------------------- native fast path

def _native():
    from audio_processor_tpu.io import native

    if not (native.available() and native.has_flac()):
        pytest.skip("native lib not built")
    return native


@pytest.mark.parametrize("mode,plan,bps", [
    ("independent", "verbatim", 16),
    ("left_side", ("fixed", 3), 16),
    ("right_side", ("lpc", 8, 14), 16),
    ("mid_side", ("fixed", 4), 24),
    ("independent", ("lpc", 32, 12), 8),
])
def test_native_matches_python(tmp_path, mode, plan, bps):
    nat = _native()
    ch = 1 if mode == "independent" and bps == 8 else 2
    x = _sig(3000, ch, bps, seed=hash((mode, str(plan))) % 997)
    data = encode_flac(x, 16000, bps, block_size=1024, ch_mode=mode,
                       plan=plan, part_order=2)
    f = tmp_path / "a.flac"
    f.write_bytes(data)
    out = nat.decode_flac(f)
    assert out is not None
    pcm_n, sr_n = out
    pcm_p, sr_p = decode_flac(data)
    assert sr_n == sr_p
    np.testing.assert_array_equal(pcm_n, pcm_p)


def test_native_wasted_bits_and_escapes(tmp_path):
    nat = _native()
    x = _sig(2048, 1, 16, seed=101, smooth=False) & ~np.int64(3)
    data = encode_flac(x, 8000, 16, block_size=1024, plan=("fixed", 1),
                       part_order=2, rice2=True, escape_parts=(0, 2),
                       wasted=2)
    f = tmp_path / "w.flac"
    f.write_bytes(data)
    out = nat.decode_flac(f)
    assert out is not None
    np.testing.assert_array_equal(out[0], decode_flac(data)[0])


def test_native_rejects_corruption(tmp_path):
    nat = _native()
    x = _sig(1024, 1, 16, seed=103)
    data = bytearray(encode_flac(x, 8000, 16, block_size=512,
                                 plan="verbatim"))
    for flip in (44, len(data) - 3, 26):  # header, payload, MD5
        bad = bytearray(data)
        bad[flip] ^= 0x55
        f = tmp_path / "bad.flac"
        f.write_bytes(bytes(bad))
        assert nat.decode_flac(f) is None, f"byte {flip} accepted"


def test_native_probe(tmp_path):
    nat = _native()
    x = _sig(1500, 2, 24, seed=107)
    f = tmp_path / "p.flac"
    f.write_bytes(encode_flac(x, 44100, 24, block_size=512,
                              plan=("fixed", 2)))
    info = nat.probe_flac(f)
    assert (info.sample_rate, info.num_frames, info.num_channels,
            info.bits_per_sample) == (44100, 1500, 2, 24)


@pytest.mark.parametrize("bps", [12, 20])
def test_non_byte_aligned_bit_depths(bps):
    """12/20-bit streams (no MD5 per spec — samples aren't
    byte-aligned) round-trip losslessly."""
    x = _sig(1024, 2, bps, seed=200 + bps)
    _roundtrip(x, 16000, bps, block_size=256, plan=("fixed", 2))


def test_id3v2_prefixed_flac(tmp_path):
    """ID3v2-tagged .flac files decode (libFLAC/ffmpeg tolerate the
    prefix; common with tagging tools)."""
    from audio_processor_tpu.io.decode import load_audio

    x = _sig(800, 2, 16, seed=211)
    body = encode_flac(x, 8000, 16, block_size=256, plan=("fixed", 1))
    payload = b"junk-tag-payload" * 8
    tag = (b"ID3\x04\x00\x00"
           + bytes([(len(payload) >> 21) & 0x7F,
                    (len(payload) >> 14) & 0x7F,
                    (len(payload) >> 7) & 0x7F,
                    len(payload) & 0x7F]) + payload)
    data = tag + body
    pcm, sr = decode_flac(data)
    assert sr == 8000
    np.testing.assert_array_equal(
        np.round(pcm.T * 32768).astype(np.int64), x)
    assert probe_flac(data).num_frames == 800
    f = tmp_path / "tagged.flac"
    f.write_bytes(data)
    pcm2, sr2 = load_audio(f)      # native declines, Python decodes
    np.testing.assert_array_equal(pcm2, pcm)


def test_trailing_id3v1_tag_tolerated(tmp_path):
    """Trailing ID3v1 tags (128-byte 'TAG' trailer) after the last
    frame decode cleanly in BOTH decoders once the STREAMINFO sample
    count is reached (libFLAC/ffmpeg behavior)."""
    x = _sig(1500, 2, 16, seed=300)
    data = encode_flac(x, 8000, 16, block_size=512,
                       plan=("fixed", 2)) + b"TAG" + b"\x00" * 125
    pcm, sr = decode_flac(data)
    np.testing.assert_array_equal(
        np.round(pcm.T * 32768).astype(np.int64), x)
    nat = _native()
    f = tmp_path / "tagged.flac"
    f.write_bytes(data)
    out = nat.decode_flac(f)
    assert out is not None
    np.testing.assert_array_equal(out[0], pcm)


def test_native_rejects_streaminfo_channel_mismatch(tmp_path):
    """A frame header claiming more channels than STREAMINFO (its
    CRC-8 is recomputable, not a MAC) must fail cleanly in the native
    decoder — this was a heap-OOB write before the guard. Python
    trusts the frame header and still decodes the real audio."""
    nat = _native()
    x = _sig(2048, 2, 16, seed=301)
    data = bytearray(encode_flac(x, 8000, 16, block_size=1024,
                                 ch_mode="mid_side", plan=("fixed", 2)))
    data[20] &= ~0x0E               # STREAMINFO channels-1: 1 -> 0
    f = tmp_path / "chmismatch.flac"
    f.write_bytes(bytes(data))
    assert nat.decode_flac(f) is None
    pcm, _ = decode_flac(bytes(data))
    assert pcm.shape[0] == 2        # python follows the frame headers

def test_ogg_flac_chained_rate_change_raises():
    """Chains at different sample rates raise instead of relabeling
    the second chain's PCM with the first rate."""
    a = _sig(1024, 1, 16, seed=47)
    b = _sig(512, 1, 16, seed=53)
    data = (encode_ogg_flac(a, 8000, 16, block_size=512, serial=1)
            + encode_ogg_flac(b, 16000, 16, block_size=512, serial=2))
    with pytest.raises(FlacError, match="rate change"):
        decode_flac(data)
