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
