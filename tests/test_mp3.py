"""MP3 ingest (io/mp3.py — optional libmpg123 binding).

Beyond-reference: the reference scans only .wav/.ogg
(pipeline.py:64-65). Fixtures are real libmp3lame streams
(tests/mp3_encoder.py); the decode oracle is pygame/SDL_mixer."""

import numpy as np
import pytest

from audio_processor_tpu.io import mp3
from audio_processor_tpu.io.decode import load_audio, load_audio_bytes, probe

from tests.mp3_encoder import encode_mp3, encoder_available


def _need_codec():
    if not (encoder_available() and mp3.mpg123_available()):
        pytest.skip("libmp3lame / libmpg123 unavailable")


def _sig(sr, dur, ch, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    base = [0.4 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * rng.standard_normal(t.size),
            0.4 * np.sin(2 * np.pi * 333 * t)]
    return np.stack(base[:ch], axis=1).astype(np.float32)


def _sdl_decode_mp3(path, sr, ch):
    from tests.sdl_oracle import sdl_decode

    out = sdl_decode(path, sr, ch)
    return None if out is None else out.astype(np.float32) / 32768.0


@pytest.mark.parametrize("sr,ch,vbr", [(16000, 2, False),
                                       (44100, 2, True),
                                       (8000, 1, False)])
def test_decode_matches_sdl_oracle(tmp_path, sr, ch, vbr):
    _need_codec()
    pcm = _sig(sr, 1.5, ch)
    body = encode_mp3(pcm, sr, vbr=vbr)
    p = tmp_path / "t.mp3"
    p.write_bytes(body)
    x, got_sr = mp3.decode_mp3(body)
    assert got_sr == sr and x.shape[0] == ch
    oracle = _sdl_decode_mp3(p, sr, ch)
    if oracle is None:
        pytest.skip("SDL mp3 decode unavailable")
    n = min(x.shape[1], oracle.shape[1])
    assert n > sr  # both decoded the bulk of the signal
    err = np.max(np.abs(x[:, :n] - oracle[:, :n]))
    assert err < 2e-3, err  # independent decoders, same frames


def test_probe_counts_frames_and_channels():
    _need_codec()
    for ch in (1, 2):
        pcm = _sig(16000, 2.0, ch)
        body = encode_mp3(pcm, 16000)
        info = mp3.probe_mp3(body)
        assert info.sample_rate == 16000
        assert info.num_channels == ch
        # granule-accurate total incl. encoder delay/padding frames
        decoded, _ = mp3.decode_mp3(body)
        assert abs(info.num_frames - decoded.shape[1]) <= 2 * 1152


def test_probe_skips_id3v2():
    _need_codec()
    body = encode_mp3(_sig(16000, 0.5, 2), 16000)
    tag = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 10]) + b"x" * 10
    info = mp3.probe_mp3(tag + body)
    assert info.num_channels == 2 and info.sample_rate == 16000


def test_load_audio_and_bytes_roundtrip(tmp_path):
    _need_codec()
    pcm = _sig(16000, 1.0, 2)
    body = encode_mp3(pcm, 16000)
    p = tmp_path / "call.mp3"
    p.write_bytes(body)
    x1, sr1 = load_audio(p)
    x2, sr2 = load_audio_bytes(body)
    assert sr1 == sr2 == 16000
    np.testing.assert_array_equal(x1, x2)
    ai = probe(p)
    assert ai is not None and ai.num_channels == 2
    assert ai.encoding == "mp3"


def test_scanner_accepts_stereo_rejects_mono_mp3(tmp_path):
    _need_codec()
    from audio_processor_tpu.io.scanner import AudioFileScanner

    (tmp_path / "stereo.mp3").write_bytes(
        encode_mp3(_sig(16000, 1.0, 2), 16000))
    (tmp_path / "mono.mp3").write_bytes(
        encode_mp3(_sig(16000, 1.0, 1), 16000))
    found = AudioFileScanner({}).scan_files_parallel(tmp_path)
    assert [f.name for f in found] == ["stereo.mp3"]


def test_missing_decoder_raises_actionable_error(monkeypatch):
    monkeypatch.setattr(mp3, "_lib", None)
    monkeypatch.setattr(mp3, "_lib_tried", True)
    assert not mp3.mpg123_available()
    with pytest.raises(RuntimeError, match="libmpg123"):
        mp3.decode_mp3(b"\xff\xfb\x90\x00" + b"\x00" * 100)


def test_garbage_is_rejected():
    _need_codec()
    with pytest.raises(ValueError):
        mp3.decode_mp3(b"definitely not an mp3 stream at all")
    with pytest.raises(ValueError):
        mp3.probe_mp3(b"\x00" * 64)

def test_probe_false_sync_in_leading_junk_does_not_mislabel():
    """A lone valid-looking mono header in leading junk (truncated/
    lying ID3 sizes, APEv2 tags) must not lock rate/channels: the
    probe requires the follower frame to parse too."""
    _need_codec()
    body = encode_mp3(_sig(16000, 1.0, 2), 16000)
    # 0xFF 0xF3 0x92 0xC0: MPEG2 Layer III, 80 kbps, 22050 Hz, MONO —
    # parses as a frame header but its "next frame" lands in zeros.
    junk = b"\xff\xf3\x92\xc0" + b"\x00" * 60
    info = mp3.probe_mp3(junk + body)
    assert info.sample_rate == 16000
    assert info.num_channels == 2


def test_probe_path_reads_header_window_only(tmp_path):
    """Path probes must not read the whole file (scan validation runs
    per .mp3): a CBR file much larger than the head window still
    probes, with duration from the size estimate."""
    _need_codec()
    pcm = _sig(16000, 30.0, 2)
    body = encode_mp3(pcm, 16000)
    p = tmp_path / "big.mp3"
    p.write_bytes(body)
    info_path = mp3.probe_mp3(p)
    info_bytes = mp3.probe_mp3(body)
    assert info_path.sample_rate == info_bytes.sample_rate == 16000
    assert info_path.num_channels == info_bytes.num_channels == 2
    decoded, _ = mp3.decode_mp3(body)
    for info in (info_path, info_bytes):
        # CBR size estimate: < 0.5% + ~2 frames of encoder padding
        assert abs(info.num_frames - decoded.shape[1]) <= \
            0.005 * decoded.shape[1] + 2 * 1152


def test_spliced_mp3_conforms_channels():
    """Byte-concatenated MP3s (same rate, stereo then mono) decode
    across the splice; each format run reshapes with its own channel
    count, conformed to the first (a last-format reshape would
    misinterleave the earlier audio)."""
    _need_codec()
    a = encode_mp3(_sig(16000, 1.0, 2), 16000)
    b = encode_mp3(_sig(16000, 1.0, 1, seed=7), 16000)
    x, sr = mp3.decode_mp3(a + b)
    assert sr == 16000 and x.shape[0] == 2
    xa, _ = mp3.decode_mp3(a)
    n = min(xa.shape[1], x.shape[1])
    # the pre-splice audio must be the stereo stream, not garbled
    err = np.max(np.abs(x[:, : xa.shape[1] - 1152] -
                        xa[:, : xa.shape[1] - 1152]))
    assert err < 2e-3, err
    assert x.shape[1] > xa.shape[1] + 8000   # splice audio present


def test_spliced_rate_change_raises():
    _need_codec()
    a = encode_mp3(_sig(44100, 0.5, 2), 44100)
    b = encode_mp3(_sig(22050, 0.5, 2), 22050)
    with pytest.raises(ValueError, match="rate change"):
        mp3.decode_mp3(a + b)


# ------------------------------------------------------------------
# Robustness: corrupted/truncated MP3 bytes must yield a clean
# ValueError (or a clean decode) from BOTH decode_mp3 and probe_mp3 —
# never a crash, hang, or leaked internal exception. Subprocess so a
# segfault at the ctypes/libmpg123 boundary fails the test.
# (Mirrors the Vorbis/Opus corruption sweeps.)
# ------------------------------------------------------------------

_FUZZ_DRIVER = r"""
import sys
import numpy as np
from audio_processor_tpu.io import mp3 as mp3_mod

sample_path, n_variants = sys.argv[1], int(sys.argv[2])
data = bytearray(open(sample_path, "rb").read())
rng = np.random.default_rng(7)
ran = 0
for k in range(n_variants):
    buf = bytearray(data)
    kind = k % 4
    if kind == 0:    # flip bytes near the head (first headers/Xing)
        for _ in range(rng.integers(1, 8)):
            buf[int(rng.integers(0, min(600, len(buf))))] = int(
                rng.integers(0, 256))
    elif kind == 1:  # flip bytes anywhere
        for _ in range(rng.integers(1, 32)):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
    elif kind == 2:  # truncate
        buf = buf[: int(rng.integers(1, len(buf)))]
    else:            # garbage behind a plausible sync
        n = int(rng.integers(32, 8192))
        buf = bytearray(b"\xff\xfb") + bytearray(
            rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    for fn in (mp3_mod.decode_mp3, mp3_mod.probe_mp3):
        try:
            out = fn(bytes(buf))
            if fn is mp3_mod.decode_mp3:
                x, sr = out
                assert sr > 0 and x.ndim == 2
                assert np.isfinite(x).all()
        except ValueError:
            pass  # the one sanctioned failure mode
    ran += 1
print(f"mp3-fuzz-ok {ran}")
"""


def test_decode_and_probe_survive_corrupt_streams(tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    _need_codec()
    sample = tmp_path / "sample.mp3"
    sample.write_bytes(encode_mp3(_sig(16000, 1.0, 2), 16000))
    r = subprocess.run(
        [sys.executable, "-c", _FUZZ_DRIVER, str(sample), "300"],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).resolve().parent.parent)
    assert r.returncode == 0, (
        f"mp3 decode/probe crashed/leaked on corrupt input:\n"
        f"{r.stdout}\n{r.stderr}")
    assert "mp3-fuzz-ok 300" in r.stdout
