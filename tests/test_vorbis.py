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


# ----------------------------------------------------------------------
# Stereo-critical paths (residue type 2, coupling) via hand-built
# codebooks + bitstreams — no Vorbis encoder exists in this image, so
# these paths can't be exercised with a real stereo file.
# ----------------------------------------------------------------------

def _write_bits(bit_list):
    """bits as (value, nbits) pairs, LSb-first packing."""
    out = bytearray()
    acc = 0
    nacc = 0
    for value, nbits in bit_list:
        acc |= (value & ((1 << nbits) - 1)) << nacc
        nacc += nbits
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _manual_codebook(dims, vq_rows, lengths):
    """Codebook with explicit VQ rows; codewords assigned per spec."""
    cb = Codebook.__new__(Codebook)
    cb.entries = len(vq_rows)
    cb.dimensions = dims
    cb.lengths = np.asarray(lengths)
    cb._build_huffman()
    cb.lookup_type = 2
    cb.vq = np.asarray(vq_rows, np.float32)
    return cb


def _codeword_bits(cb, entry):
    """(value, nbits) emitting the codeword MSB-first as the decoder
    reads single bits."""
    for (length, code), e in cb.decode_table.items():
        if e == entry:
            return [((code >> (length - 1 - i)) & 1, 1)
                    for i in range(length)]
    raise KeyError(entry)


def test_residue_type2_interleave_and_decode():
    from audio_processor_tpu.io.vorbis import Residue, decode_residue

    # classbook: scalar book, 2 classes, 1 classword per codeword
    classbook = _manual_codebook(1, [[0.0], [0.0]], [1, 1])
    # value book: dims=2 so it spans interleaved channel samples
    vbook = _manual_codebook(2, [[1.0, 2.0], [3.0, 4.0]], [1, 1])
    r = Residue(kind=2, begin=0, end=8, partition_size=4,
                classifications=2, classbook=0,
                cascade=[1, 1], books=[[1] + [-1] * 7, [1] + [-1] * 7])
    codebooks = [classbook, vbook]

    bits = []
    # partition 0: class 0; partition 1: class 1
    bits += _codeword_bits(classbook, 0)
    # partition 0 values: 2 vq reads of dim 2 (psize=4)
    bits += _codeword_bits(vbook, 0) + _codeword_bits(vbook, 1)
    bits += _codeword_bits(classbook, 1)
    bits += _codeword_bits(vbook, 1) + _codeword_bits(vbook, 0)
    br = BitReader(_write_bits(bits))

    out = decode_residue(br, r, codebooks, [False, False], n_half=4)
    # interleaved vector was [1,2,3,4, 3,4,1,2] -> ch0 takes even idx
    np.testing.assert_allclose(out[0], [1, 3, 3, 1])
    np.testing.assert_allclose(out[1], [2, 4, 4, 2])


def test_residue_type0_stride():
    from audio_processor_tpu.io.vorbis import Residue, decode_residue

    classbook = _manual_codebook(1, [[0.0]], [1])
    vbook = _manual_codebook(2, [[1.0, 10.0], [2.0, 20.0]], [1, 1])
    r = Residue(kind=0, begin=0, end=4, partition_size=4,
                classifications=1, classbook=0,
                cascade=[1], books=[[1] + [-1] * 7])
    bits = _codeword_bits(classbook, 0)
    bits += _codeword_bits(vbook, 0) + _codeword_bits(vbook, 1)
    br = BitReader(_write_bits(bits))
    out = decode_residue(br, r, [classbook, vbook], [False], n_half=4)
    # step = psize/dims = 2: entry j goes to v[j], v[j+step]
    np.testing.assert_allclose(out[0], [1, 2, 10, 20])


def test_inverse_coupling_rules():
    """Square-polar inverse coupling (spec 4.3.5.2)."""
    M = np.array([3.0, 3.0, -3.0, -3.0, 0.0], np.float32)
    A = np.array([1.0, -1.0, 1.0, -1.0, 2.0], np.float32)
    pos = M > 0
    apos = A > 0
    newM = np.where(pos, np.where(apos, M, M + A),
                    np.where(apos, M, M - A))
    newA = np.where(pos, np.where(apos, M - A, M),
                    np.where(apos, M + A, M))
    np.testing.assert_allclose(newM, [3, 2, -3, -2, 0])
    np.testing.assert_allclose(newA, [2, 3, -2, -3, 2])


# ------------------------------------------------------------------
# Native decoder robustness: corrupted/truncated streams must return
# an error code (or a clean decode), never crash the process. Runs in
# a subprocess so a segfault would fail the test instead of pytest.
# (Hardening per round-1 advisor findings: setup index validation,
# blocksize/codebook range checks, residue partition-end clamping.)
# ------------------------------------------------------------------

_FUZZ_DRIVER = r"""
import sys, tempfile, os
import numpy as np
from audio_processor_tpu.io import native

sample_path, n_variants = sys.argv[1], int(sys.argv[2])
data = bytearray(open(sample_path, "rb").read())
rng = np.random.default_rng(1234)
td = tempfile.mkdtemp()
ran = 0
for k in range(n_variants):
    buf = bytearray(data)
    kind = k % 4
    if kind == 0:    # flip bytes in the header pages (setup tables)
        for _ in range(rng.integers(1, 8)):
            buf[int(rng.integers(0, min(4096, len(buf))))] = int(
                rng.integers(0, 256))
    elif kind == 1:  # flip bytes anywhere (audio packets)
        for _ in range(rng.integers(1, 32)):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
    elif kind == 2:  # truncate
        buf = buf[: int(rng.integers(1, len(buf)))]
    else:            # random garbage behind a valid OggS magic
        n = int(rng.integers(32, 8192))
        buf = bytearray(b"OggS") + bytearray(
            rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    p = os.path.join(td, "fuzz.ogg")
    open(p, "wb").write(bytes(buf))
    native.decode_vorbis(p)  # must not crash; None/err is fine
    ran += 1
print(f"fuzz-ok {ran}")
"""


@needs_sample
def test_native_decoder_survives_corrupt_streams():
    import subprocess
    import sys

    from audio_processor_tpu.io import native

    if not native.has_vorbis():
        pytest.skip("native vorbis lib not built")
    r = subprocess.run(
        [sys.executable, "-c", _FUZZ_DRIVER, str(OGG_SAMPLE), "400"],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).resolve().parent.parent)
    assert r.returncode == 0, (
        f"native decoder crashed on corrupt input:\n{r.stdout}\n{r.stderr}")
    assert "fuzz-ok 400" in r.stdout


# ------------------------------------------------------------------
# Stereo validation on full generated streams (tests/vorbis_encoder.py
# — no Vorbis encoder exists in this image, so we emit spec-valid
# streams ourselves): residue type 2 with channel interleave,
# square-polar coupling, mixed 256/2048 block sizes with transition
# windows. Three independent decoders must agree sample-by-sample.
# ------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stereo_stream_python_cpp_sdl_agree(seed, tmp_path):
    import os

    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    pygame = pytest.importorskip("pygame")
    import pygame.sndarray as sa

    from tests.vorbis_encoder import SR as ENC_SR
    from tests.vorbis_encoder import make_stereo_stream
    from audio_processor_tpu.io import native

    data = make_stereo_stream(n_packets=40, seed=seed)
    p = tmp_path / "stereo.ogg"
    p.write_bytes(data)

    py_pcm, py_sr = decode_vorbis(data)
    assert py_sr == ENC_SR and py_pcm.shape[0] == 2
    assert py_pcm.shape[1] > 20000

    if native.has_vorbis():
        cpp = native.decode_vorbis(p)
        assert cpp is not None, "native stereo decode failed"
        cpp_pcm, cpp_sr = cpp
        assert cpp_sr == py_sr
        n = min(py_pcm.shape[1], cpp_pcm.shape[1])
        np.testing.assert_array_equal(py_pcm[:, :n], cpp_pcm[:, :n])

    pygame.mixer.quit()
    pygame.mixer.init(frequency=ENC_SR, size=-16, channels=2)
    ref = sa.array(pygame.mixer.Sound(str(p))).astype(np.float32) / 32768.0
    m = min(ref.shape[0], py_pcm.shape[1])
    assert m > 20000
    np.testing.assert_allclose(np.clip(py_pcm[:, :m].T, -1, 1), ref[:m],
                               atol=2e-5)  # int16 quantization bound


def test_stereo_ogg_through_load_audio(tmp_path):
    """A stereo .ogg survives the production decode facade (the
    reference scanner requires 2-channel input)."""
    from tests.vorbis_encoder import make_stereo_stream
    from audio_processor_tpu.io.decode import load_audio

    p = tmp_path / "call.ogg"
    p.write_bytes(make_stereo_stream(n_packets=24, seed=7))
    wav, sr = load_audio(p)
    assert wav.shape[0] == 2 and wav.shape[1] > 10000
    assert sr == 8000


def test_truncated_long_packet_after_short_block(tmp_path):
    """Regression (found by ASAN fuzzing): a short-block packet
    followed by a long-block packet truncated mid-floor must not
    synthesize from the previous block's shorter floor curve (stale
    floor_used state -> heap overflow read in the native decoder)."""
    import subprocess
    import sys

    from tests import vorbis_encoder as V

    setup = VorbisSetup(V.ident_packet(), V.setup_packet())
    rng = np.random.default_rng(5)
    p_short = V.audio_packet(setup, rng, 0)
    p_long = V.audio_packet(setup, rng, 1, prev_flag=0, next_flag=1)
    streams = []
    for cut in (2, 3, 5, len(p_long) // 3, len(p_long) - 1):
        pages = [
            V.ogg_page([V.ident_packet()], 1, 0, 0, 0x02),
            V.ogg_page([V.comment_packet(), V.setup_packet()], 1, 1, 0, 0),
            V.ogg_page([p_short, p_short, p_long[:cut], p_short],
                       1, 2, 4096, 0x04),
        ]
        streams.append(b"".join(pages))

    # Python decoder: must not raise and must not reuse stale floors.
    for data in streams:
        pcm, sr = decode_vorbis(data)
        assert sr == 8000

    # Native decoder: subprocess so a regression (segfault) fails the
    # test instead of killing pytest.
    paths = []
    for i, data in enumerate(streams):
        p = tmp_path / f"trunc{i}.ogg"
        p.write_bytes(data)
        paths.append(str(p))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from audio_processor_tpu.io import native\n"
        "for p in %r:\n"
        "    native.decode_vorbis(p)\n"
        "print('trunc-ok')\n"
    ) % (str(Path(__file__).resolve().parent.parent), paths)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "trunc-ok" in r.stdout, r.stderr


# ------------------------------------------------------------------
# Real-world-encoder streams: the system libvorbisenc (the Xiph
# reference encoder, the same code ffmpeg's libvorbis path runs) is
# driven via ctypes (tests/libvorbis_ctypes.py) to produce genuine
# production bitstreams — VBR psychoacoustics, real codebooks,
# long/short block switching, stereo coupling. Our Python and C++
# decoders must agree with libvorbisfile (the Xiph reference decoder)
# on them. Reference ingest path: services/audio_processor.py:76-86.
# ------------------------------------------------------------------

def _real_encoder_pcm(sr, dur, stereo, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * sr)) / sr
    a = 0.4 * np.sin(2 * np.pi * 331 * t) * \
        (0.6 + 0.4 * np.sin(2 * np.pi * 2.3 * t))
    b = 0.4 * np.sin(2 * np.pi * 497 * t) + \
        0.05 * rng.standard_normal(t.shape[0])
    # hard transients force short-block/transition windows
    for pos in (int(0.31 * sr), int(0.73 * sr), int(1.17 * sr)):
        a[pos:pos + 256] += 0.5 * rng.standard_normal(256)
        b[pos:pos + 256] += 0.5 * rng.standard_normal(256)
    pcm = np.stack([a, b]) if stereo else a[None]
    return np.clip(pcm, -0.98, 0.98).astype(np.float32)


@pytest.mark.parametrize("sr,stereo,quality", [
    (44100, True, 0.4),   # typical music file: coupling + mixed blocks
    (44100, True, 0.1),   # low-rate setups exercise other codebooks
    (16000, True, 0.4),   # call-center rate, stereo
    (16000, False, 0.4),  # mono
])
def test_real_libvorbisenc_stream_decodes_bit_true(sr, stereo, quality,
                                                   tmp_path):
    from tests.libvorbis_ctypes import (available, decode_vorbisfile,
                                        encode_vorbis)

    if not available():
        pytest.skip("system libvorbisenc/libvorbisfile not present")
    from audio_processor_tpu.io import native

    pcm = _real_encoder_pcm(sr, 1.6, stereo, seed=sr + int(quality * 10))
    data = encode_vorbis(pcm, sr, quality)
    assert data[:4] == b"OggS" and len(data) > 4000

    ref_pcm, ref_sr = decode_vorbisfile(data)   # Xiph reference decoder
    py_pcm, py_sr = decode_vorbis(data)         # first-party Python
    assert py_sr == ref_sr == sr
    assert py_pcm.shape[0] == ref_pcm.shape[0] == (2 if stereo else 1)
    n = min(py_pcm.shape[1], ref_pcm.shape[1])
    assert n >= int(1.5 * sr)
    # Independent float implementations of the same spec math: tiny
    # numeric skew only.
    np.testing.assert_allclose(py_pcm[:, :n], ref_pcm[:, :n],
                               atol=1e-4)
    corr = np.corrcoef(py_pcm[:, :n].ravel(), ref_pcm[:, :n].ravel())
    assert corr[0, 1] > 0.999999

    if native.has_vorbis():
        p = tmp_path / "real.ogg"
        p.write_bytes(data)
        cpp = native.decode_vorbis(p)
        assert cpp is not None, "native decode of real stream failed"
        cpp_pcm, cpp_sr = cpp
        assert cpp_sr == sr
        m = min(n, cpp_pcm.shape[1])
        # Real VBR streams hit float-op-ordering differences between
        # numpy and C++ (observed max ~8e-7, well under the 3e-5 int16
        # quantization step); the self-generated-stream tests above
        # keep the bit-exact assertion on the shared codepaths.
        np.testing.assert_allclose(py_pcm[:, :m], cpp_pcm[:, :m],
                                   atol=2e-6)


@pytest.mark.parametrize("stereo", [True, False])
def test_streaming_decode_equals_eager(stereo, tmp_path):
    """decode_vorbis_stream blocks concatenate to exactly the eager
    decode (incl. the end-granule trim on the final block), on a real
    libvorbisenc stream."""
    from tests.libvorbis_ctypes import available, encode_vorbis

    if not available():
        pytest.skip("system libvorbisenc not present")
    from audio_processor_tpu.io.vorbis import decode_vorbis_stream

    pcm = _real_encoder_pcm(16000, 1.2, stereo, seed=5)
    data = encode_vorbis(pcm, 16000, 0.4)
    full, sr = decode_vorbis(data)
    sr2, blocks = decode_vorbis_stream(data)
    blocks = list(blocks)
    assert sr2 == sr
    assert len(blocks) > 4           # actually streamed
    streamed = np.concatenate(blocks, axis=1)
    np.testing.assert_array_equal(streamed, full)


def test_seek_range_bit_exact_self_generated():
    """decode_vorbis_range == the same slice of a full decode, bit for
    bit, on a self-generated stereo stream (short+long blocks)."""
    from tests.vorbis_encoder import make_stereo_stream

    from audio_processor_tpu.io.vorbis import (
        VorbisDecoder, decode_vorbis_range,
    )

    data = make_stereo_stream(n_packets=40, seed=3)
    full, sr = VorbisDecoder(data).decode()
    T = full.shape[1]
    rng = np.random.default_rng(0)
    cases = [(0, 100), (1, None), (373, 1000), (T // 2, 777),
             (T - 50, 200), (T + 10, 5), (0, None), (5, 0)]
    cases += [(int(rng.integers(0, T)), int(rng.integers(1, T)))
              for _ in range(8)]
    for s, n in cases:
        pcm, r = decode_vorbis_range(data, s, n)
        assert r == sr
        ref = full[:, s:(s + n if n is not None else None)]
        assert pcm.shape == ref.shape, (s, n)
        np.testing.assert_array_equal(pcm, ref, err_msg=f"({s},{n})")


def test_seek_range_bit_exact_real_encoder():
    """Seek parity on a real libvorbisenc stream (the encoder family
    production OGGs come from)."""
    from tests.libvorbis_ctypes import available, encode_vorbis

    if not available():
        pytest.skip("system libvorbisenc not present")
    from audio_processor_tpu.io.vorbis import (
        VorbisDecoder, decode_vorbis_range,
    )

    pcm_in = _real_encoder_pcm(16000, 2.0, stereo=True, seed=9)
    data = encode_vorbis(pcm_in, 16000, 0.4)
    full, sr = VorbisDecoder(data).decode()
    T = full.shape[1]
    for s, n in [(0, 500), (1234, 4096), (T // 2, None),
                 (T - 100, 1000), (17, 1)]:
        pcm, _ = decode_vorbis_range(data, s, n)
        ref = full[:, s:(s + n if n is not None else None)]
        np.testing.assert_array_equal(pcm, ref, err_msg=f"({s},{n})")


def test_seek_decodes_only_needed_frames(monkeypatch):
    """A tail seek must not decode the whole stream: the header-bit
    frame index (VorbisDecoder._frame_index) positions the decode at
    one priming frame before the range, so residue decoding runs for
    O(range) packets, not O(file)."""
    from tests.vorbis_encoder import make_stereo_stream

    from audio_processor_tpu.io import vorbis as V

    data = make_stereo_stream(n_packets=60, seed=4)
    full, _ = V.VorbisDecoder(data).decode()
    T = full.shape[1]

    calls = {"n": 0}
    real = V.decode_residue

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(V, "decode_residue", counting)
    pcm, _ = V.decode_vorbis_range(data, T - 64, 64)
    np.testing.assert_array_equal(pcm, full[:, T - 64:])
    # 60-packet stream; a tail seek should touch only a handful of
    # frames (each frame = one residue call per submap, stereo
    # coupled -> 1 call/frame here).
    assert 0 < calls["n"] <= 8, calls["n"]


def test_granule_trim_across_multiple_blocks(tmp_path):
    """A legal edited/truncated stream whose final-page granulepos
    cuts into more than the final lapped block must truncate exactly
    like decode-then-slice (the trim is clamped per block in global
    coordinates, not final-block-only)."""
    from tests.vorbis_encoder import make_stereo_stream, ogg_crc

    from audio_processor_tpu.io.vorbis import (
        VorbisDecoder, decode_vorbis_range,
    )

    data = make_stereo_stream(n_packets=40, seed=6)
    full, sr = VorbisDecoder(data).decode()
    T = full.shape[1]
    cut = 7000                       # spans many lapped blocks
    assert T > cut + 200
    idx = data.rfind(b"OggS")
    n_segs = data[idx + 26]
    body = sum(data[idx + 27: idx + 27 + n_segs])
    page = bytearray(data[idx: idx + 27 + n_segs + body])
    page[6:14] = int(T - cut).to_bytes(8, "little", signed=True)
    page[22:26] = b"\0\0\0\0"
    page[22:26] = ogg_crc(bytes(page)).to_bytes(4, "little")
    edited = data[:idx] + bytes(page)

    pcm, r = VorbisDecoder(edited).decode()
    assert r == sr
    assert pcm.shape[1] == T - cut
    np.testing.assert_array_equal(pcm, full[:, :T - cut])
    # Seeking respects the shortened stream too.
    rng_pcm, _ = decode_vorbis_range(edited, T - cut - 100, 200)
    np.testing.assert_array_equal(rng_pcm, full[:, T - cut - 100:T - cut])
    # The C++ decoder trims with min(granule, written) globally —
    # Python must agree (bit-exact on self-generated streams).
    from audio_processor_tpu.io import native

    if native.has_vorbis():
        p = tmp_path / "edited.ogg"
        p.write_bytes(edited)
        out = native.decode_vorbis(p)
        assert out is not None
        pcm_c, sr_c = out
        assert sr_c == sr
        assert pcm_c.shape == pcm.shape
        np.testing.assert_array_equal(pcm_c, pcm)


def test_chained_vorbis_streams():
    """RFC 3533 section 3 chains (complete logical streams
    concatenated — the reference's ffmpeg mechanism plays these
    seamlessly): decode_vorbis appends the chains; the streaming and
    range paths agree; same- and different-serial chains both work."""
    from audio_processor_tpu.io.vorbis import (decode_vorbis,
                                               decode_vorbis_range,
                                               decode_vorbis_stream)
    from tests.vorbis_encoder import make_stereo_stream

    s1 = make_stereo_stream(n_packets=12, seed=11)
    s2 = make_stereo_stream(n_packets=10, seed=22)          # same serial
    s3 = make_stereo_stream(n_packets=8, seed=33, serial=0x99)

    ref = [decode_vorbis(s)[0] for s in (s1, s2, s3)]
    data = s1 + s2 + s3
    out, rate = decode_vorbis(data)
    expected = np.concatenate(ref, axis=1)
    assert out.shape == expected.shape
    np.testing.assert_array_equal(out, expected)

    rate2, blocks = decode_vorbis_stream(data)
    assert rate2 == rate
    np.testing.assert_array_equal(np.concatenate(list(blocks), axis=1),
                                  out)

    lo = ref[0].shape[1] - 50
    piece, _ = decode_vorbis_range(data, lo, 120)
    np.testing.assert_array_equal(piece, out[:, lo:lo + 120])

    # load_audio_bytes-level dispatch must also append chains (the
    # native fast path is single-chain and must be bypassed).
    import tempfile, os
    from audio_processor_tpu.io.decode import load_audio
    with tempfile.NamedTemporaryFile(suffix=".ogg", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        pcm, r = load_audio(path)
        assert r == rate
        assert pcm.shape[1] == out.shape[1]
    finally:
        os.unlink(path)
