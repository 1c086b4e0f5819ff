"""First-party Ogg/Vorbis decoder tests, validated sample-by-sample
against SDL_mixer's (pygame's) decode of a real Vorbis file."""

from pathlib import Path

import numpy as np
import pytest

from audio_processor_tpu.io.vorbis import (
    BitReader, Codebook, VorbisSetup, decode_vorbis, float32_unpack,
    ilog, ogg_packets,
)

OGG_SAMPLE = Path("/opt/venv/lib/python3.12/site-packages/pygame/"
                  "examples/data/house_lo.ogg")

needs_sample = pytest.mark.skipif(not OGG_SAMPLE.exists(),
                                  reason="no ogg sample in image")


def test_bitreader_lsb_first():
    br = BitReader(bytes([0b10110100, 0b00000011]))
    assert br.read(3) == 0b100
    assert br.read(5) == 0b10110
    assert br.read(2) == 0b11
    assert br.read(6) == 0
    with pytest.raises(EOFError):
        br.read(1)


def test_ilog():
    assert [ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]


def test_float32_unpack():
    # exponent 788, mantissa 1 -> 1.0
    assert float32_unpack((788 << 21) | 1) == 1.0
    assert float32_unpack((788 << 21) | 1 | 0x80000000) == -1.0
    assert float32_unpack((789 << 21) | 3) == 6.0


@needs_sample
def test_ogg_packet_reassembly():
    pk = list(ogg_packets(OGG_SAMPLE.read_bytes()))
    assert pk[0][:7] == b"\x01vorbis"
    assert pk[1][:7] == b"\x03vorbis"
    assert pk[2][:7] == b"\x05vorbis"
    assert len(pk) > 10


@needs_sample
def test_setup_header_parses():
    pk = list(ogg_packets(OGG_SAMPLE.read_bytes()))
    s = VorbisSetup(pk[0], pk[2])
    assert s.channels == 1
    assert s.sample_rate == 11025
    assert len(s.codebooks) > 0
    assert len(s.floors) >= 1
    assert len(s.modes) >= 1


@needs_sample
def test_decode_matches_sdl_mixer():
    import os

    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    pygame = pytest.importorskip("pygame")
    import pygame.sndarray as sa

    pcm, sr = decode_vorbis(OGG_SAMPLE)
    assert sr == 11025
    assert pcm.shape == (1, 78331)  # exact granule position

    pygame.mixer.quit()
    pygame.mixer.init(frequency=11025, size=-16, channels=1)
    ref = sa.array(pygame.mixer.Sound(str(OGG_SAMPLE))) \
        .astype(np.float32).reshape(-1) / 32768.0
    mine = np.clip(pcm[0], -1.0, 1.0)
    n = min(len(ref), len(mine))
    corr = np.corrcoef(mine[:n], ref[:n])[0, 1]
    assert corr > 0.99999
    # mean error at the oracle's int16 quantization floor
    assert np.abs(mine[:n] - ref[:n]).mean() < 5e-5


def test_huffman_assignment():
    """Spec example: lengths [2,4,4,4,4,2,3,3] -> codewords
    00, 0100, 0101, 0110, 0111, 10, 110, 111."""
    class FakeBook(Codebook):
        def __init__(self, lengths):
            self.entries = len(lengths)
            self.lengths = np.asarray(lengths)
            self._build_huffman()

    cb = FakeBook([2, 4, 4, 4, 4, 2, 3, 3])
    expect = {(2, 0b00): 0, (4, 0b0100): 1, (4, 0b0101): 2,
              (4, 0b0110): 3, (4, 0b0111): 4, (2, 0b10): 5,
              (3, 0b110): 6, (3, 0b111): 7}
    assert cb.decode_table == expect


@needs_sample
def test_load_audio_uses_first_party_decoder(monkeypatch):
    from audio_processor_tpu.io.decode import load_audio

    x, sr = load_audio(OGG_SAMPLE)
    assert sr == 11025
    assert x.shape[0] == 1
    assert np.abs(x).max() <= 1.0


@needs_sample
def test_cpp_decoder_matches_python_reference():
    from audio_processor_tpu.io import native

    if not native.has_vorbis():
        pytest.skip("native vorbis not built")
    out = native.decode_vorbis(OGG_SAMPLE)
    assert out is not None
    pcm_c, sr_c = out
    pcm_p, sr_p = decode_vorbis(OGG_SAMPLE)
    assert sr_c == sr_p == 11025
    assert pcm_c.shape == pcm_p.shape
    np.testing.assert_allclose(pcm_c, pcm_p, atol=2e-6)


@needs_sample
def test_native_vorbis_probe():
    import ctypes

    from audio_processor_tpu.io import native

    if not native.has_vorbis():
        pytest.skip("native vorbis not built")
    lib = native._load()
    meta = (ctypes.c_int64 * 3)()
    assert lib.ap_vorbis_probe(str(OGG_SAMPLE).encode(), meta) == 0
    assert (meta[0], meta[1], meta[2]) == (11025, 78331, 1)
