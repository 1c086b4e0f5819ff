"""Minimal first-party Ogg/Vorbis-I encoder for test fixtures.

No Vorbis encoder (ffmpeg/oggenc/libvorbis) exists in this image, so
this module emits spec-valid stereo streams exercising the decoder
paths a real call-center .ogg hits: residue type 2 with interleaved
channels, square-polar coupling, both block sizes with transition
windows, floor1 curves, and VQ lookup-type-2 codebooks.

The packets do not encode meaningful audio — they are streams of valid
codewords drawn from a seeded RNG. That is exactly what the tests
need: three independent decoders (the C++ native decoder, the Python
reference decoder, and SDL_mixer via pygame) must agree sample-by-
sample on whatever PCM those packets decode to.

Bit/packet layout follows the Vorbis I spec sections 4.2-4.3 and
mirrors the parse order of audio_processor_tpu/io/vorbis.py.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from audio_processor_tpu.io.vorbis import BitReader, VorbisSetup, ilog


class BitWriter:
    """LSb-first bit packer (inverse of io.vorbis.BitReader)."""

    def __init__(self):
        self._bits: List[int] = []

    def write(self, value: int, nbits: int) -> "BitWriter":
        for i in range(nbits):
            self._bits.append((value >> i) & 1)
        return self

    def write_codeword(self, codebook, entry: int) -> "BitWriter":
        """Emit the canonical codeword for ``entry`` (decoder
        accumulates MSB-first, so emit code bits MSB first)."""
        for (length, code), e in codebook.decode_table.items():
            if e == entry:
                for i in range(length - 1, -1, -1):
                    self._bits.append((code >> i) & 1)
                return self
        raise KeyError(f"entry {entry} has no codeword")

    def to_bytes(self) -> bytes:
        out = bytearray((len(self._bits) + 7) // 8)
        for i, b in enumerate(self._bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------- ogg
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 \
            else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ \
            _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def ogg_page(packets: List[bytes], serial: int, seq: int, granule: int,
             header_type: int) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pkt in packets:
        n = len(pkt)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)       # includes the 0 terminator for n%255==0
        body.extend(pkt)
    head = bytearray(b"OggS")
    head.append(0)                      # version
    head.append(header_type)
    head.extend(int(granule).to_bytes(8, "little", signed=True))
    head.extend(serial.to_bytes(4, "little"))
    head.extend(seq.to_bytes(4, "little"))
    head.extend(b"\x00\x00\x00\x00")    # crc placeholder
    head.append(len(lacing))
    head.extend(lacing)
    page = bytes(head) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


# ----------------------------------------------------------- headers
SR = 8000
CHANNELS = 2
BS0_EXP, BS1_EXP = 8, 11      # blocksizes 256 / 2048
RANGEBITS = 7                 # floor1 x range 0..128
FLOOR_X = (32, 64, 96, 16)    # 2 partitions x class dim 2, unique
RESIDUE_END = 256
PSIZE = 16


def _float32_pack(mantissa: int, exponent: int, sign: int = 0) -> int:
    return (sign << 31) | (exponent << 21) | mantissa


def ident_packet() -> bytes:
    w = BitWriter()
    w.write(1, 8)
    for ch in b"vorbis":
        w.write(ch, 8)
    w.write(0, 32)            # version
    w.write(CHANNELS, 8)
    w.write(SR, 32)
    w.write(0, 32).write(0, 32).write(0, 32)   # bitrates
    w.write(BS0_EXP, 4).write(BS1_EXP, 4)
    w.write(1, 1)             # framing
    return w.to_bytes()


def comment_packet() -> bytes:
    w = BitWriter()
    w.write(3, 8)
    for ch in b"vorbis":
        w.write(ch, 8)
    vendor = b"audio_processor_tpu test encoder"
    w.write(len(vendor), 32)
    for ch in vendor:
        w.write(ch, 8)
    w.write(0, 32)            # no user comments
    w.write(1, 1)             # framing
    return w.to_bytes()


def _write_codebook(w: BitWriter, dims: int, lengths: List[int],
                    lookup: int = 0, value_bits: int = 3,
                    delta_exp_pow2: int = 6, seed: int = 0) -> None:
    """Unordered non-sparse codebook; lookup 0 (scalar) or 2 (direct
    VQ, min=0, delta=2**-delta_exp_pow2, entries*dims values)."""
    w.write(0x564342, 24)
    w.write(dims, 16)
    w.write(len(lengths), 24)
    w.write(0, 1)             # not ordered
    w.write(0, 1)             # not sparse
    for l in lengths:
        w.write(l - 1, 5)
    w.write(lookup, 4)
    if lookup == 2:
        w.write(_float32_pack(0, 0), 32)                    # min 0.0
        w.write(_float32_pack(1, 788 - delta_exp_pow2), 32)  # delta
        w.write(value_bits - 1, 4)
        w.write(0, 1)         # sequence_p
        rng = np.random.default_rng(seed)
        for _ in range(len(lengths) * dims):
            w.write(int(rng.integers(0, 1 << value_bits)), value_bits)


def setup_packet() -> bytes:
    w = BitWriter()
    w.write(5, 8)
    for ch in b"vorbis":
        w.write(ch, 8)
    # --- 4 codebooks ---
    w.write(4 - 1, 8)
    _write_codebook(w, dims=1, lengths=[2, 2, 2, 2])          # cb0 floor master
    _write_codebook(w, dims=1, lengths=[3] * 8)               # cb1 floor values
    _write_codebook(w, dims=2, lengths=[2, 2, 2, 2])          # cb2 res classbook
    _write_codebook(w, dims=4, lengths=[4] * 16, lookup=2,
                    seed=42)                                  # cb3 res VQ
    # --- time domain transforms ---
    w.write(0, 6)             # count-1
    w.write(0, 16)
    # --- 1 floor, type 1 ---
    w.write(0, 6)
    w.write(1, 16)
    w.write(2, 5)             # partitions
    w.write(0, 4).write(0, 4)  # partition class list [0, 0]
    w.write(2 - 1, 3)         # class 0 dims
    w.write(1, 2)             # class 0 subclass bits
    w.write(0, 8)             # masterbook cb0
    w.write(1 + 1, 8)         # subclass book 0 -> cb1
    w.write(1 + 1, 8)         # subclass book 1 -> cb1
    w.write(2 - 1, 2)         # multiplier 2 -> range 128
    w.write(RANGEBITS, 4)
    for x in FLOOR_X:
        w.write(x, RANGEBITS)
    # --- 1 residue, type 2 ---
    w.write(0, 6)
    w.write(2, 16)
    w.write(0, 24)            # begin
    w.write(RESIDUE_END, 24)  # end
    w.write(PSIZE - 1, 24)
    w.write(2 - 1, 6)         # classifications
    w.write(2, 8)             # classbook cb2
    w.write(0, 3)             # class 0 cascade low (no books)
    w.write(0, 1)
    w.write(1, 3)             # class 1 cascade low: pass 0
    w.write(0, 1)
    w.write(3, 8)             # class 1 pass 0 book: cb3
    # --- 1 mapping, type 0 ---
    w.write(0, 6)
    w.write(0, 16)
    w.write(0, 1)             # submaps flag -> 1 submap
    w.write(1, 1)             # coupling flag
    w.write(0, 8)             # steps - 1
    w.write(0, ilog(CHANNELS - 1))   # magnitude ch 0
    w.write(1, ilog(CHANNELS - 1))   # angle ch 1
    w.write(0, 2)             # reserved
    w.write(0, 8)             # submap time config (discarded)
    w.write(0, 8)             # submap floor
    w.write(0, 8)             # submap residue
    # --- 2 modes ---
    w.write(2 - 1, 6)
    for blockflag in (0, 1):
        w.write(blockflag, 1)
        w.write(0, 16).write(0, 16)
        w.write(0, 8)
    w.write(1, 1)             # framing
    return w.to_bytes()


# ------------------------------------------------------ audio packets

def _gen_floor(w: BitWriter, setup: VorbisSetup, rng, nonzero: bool
               ) -> bool:
    """Mirror of decode_floor1's read order for our fixed floor."""
    if not nonzero:
        w.write(0, 1)
        return False
    w.write(1, 1)
    f = setup.floors[0]
    ybits = ilog(128 - 1)
    w.write(int(rng.integers(0, 128)), ybits)
    w.write(int(rng.integers(0, 128)), ybits)
    cb0, cb1 = setup.codebooks[0], setup.codebooks[1]
    for cl in f.partition_class_list:
        cbits = f.class_subclasses[cl]
        cval = int(rng.integers(0, 4))
        if cbits:
            w.write_codeword(cb0, cval)
        csub = (1 << cbits) - 1
        for _ in range(f.class_dimensions[cl]):
            book = f.subclass_books[cl][cval & csub]
            cval >>= cbits
            if book >= 0:
                w.write_codeword(setup.codebooks[book],
                                 int(rng.integers(0, 8)))
    return True


def _gen_residue2(w: BitWriter, setup: VorbisSetup, rng, n_half: int,
                  any_floor: bool) -> None:
    """Mirror of decode_residue's read order (type 2, nch=1)."""
    if not any_floor:
        return                # all channels do-not-decode: no bits
    r = setup.residues[0]
    actual_size = n_half * CHANNELS
    begin = min(r.begin, actual_size)
    end = min(r.end, actual_size)
    n_to_read = end - begin
    if n_to_read <= 0:
        return
    classbook = setup.codebooks[r.classbook]
    cpc = classbook.dimensions
    partitions = n_to_read // r.partition_size
    classifs = [0] * (partitions + cpc)
    for pas in range(8):
        pc = 0
        while pc < partitions:
            if pas == 0:
                cw = int(rng.integers(0, classbook.entries))
                w.write_codeword(classbook, cw)
                tmp = cw
                for i in range(cpc - 1, -1, -1):
                    classifs[pc + i] = tmp % r.classifications
                    tmp //= r.classifications
            i = 0
            while i < cpc and pc < partitions:
                vq = classifs[pc]
                book_idx = r.books[vq][pas]
                if book_idx >= 0:
                    book = setup.codebooks[book_idx]
                    for _ in range(r.partition_size // book.dimensions):
                        w.write_codeword(
                            book, int(rng.integers(0, book.entries)))
                i += 1
                pc += 1
        if all((r.cascade[c] >> (pas + 1)) == 0
               for c in range(r.classifications)):
            break


def audio_packet(setup: VorbisSetup, rng, mode_idx: int,
                 prev_flag: int = 1, next_flag: int = 1) -> bytes:
    """One audio packet. For long blocks, ``prev_flag``/``next_flag``
    MUST state whether the neighboring blocks are long — decoders
    derive the lap alignment from these flags (stb/libvorbis), so
    flags inconsistent with the actual mode sequence produce
    decoder-dependent output."""
    w = BitWriter()
    w.write(0, 1)                      # audio packet
    w.write(mode_idx, ilog(len(setup.modes) - 1))
    mode = setup.modes[mode_idx]
    if mode.blockflag:
        w.write(prev_flag, 1)
        w.write(next_flag, 1)
    n_half = (1 << BS1_EXP if mode.blockflag else 1 << BS0_EXP) // 2
    used = []
    for _ in range(CHANNELS):
        # mostly nonzero floors; sometimes silence to hit the
        # do-not-decode path
        used.append(_gen_floor(w, setup, rng,
                               nonzero=bool(rng.integers(0, 8))))
    _gen_residue2(w, setup, rng, n_half, any_floor=any(used))
    return w.to_bytes()


# ------------------------------------------------------------ stream

def make_stereo_stream(n_packets: int = 40, seed: int = 0,
                       serial: int = 0x7473) -> bytes:
    """Full Ogg Vorbis stereo stream (bytes)."""
    rng = np.random.default_rng(seed)
    setup = VorbisSetup(ident_packet(), setup_packet())

    pages = [ogg_page([ident_packet()], serial, 0, 0, 0x02),
             ogg_page([comment_packet(), setup_packet()], serial, 1, 0, 0)]

    blocksizes = (1 << BS0_EXP, 1 << BS1_EXP)
    # Choose the mode sequence first: long blocks must announce their
    # neighbors' sizes truthfully via the window flags.
    modes = [int(rng.integers(0, 2)) for _ in range(n_packets)]
    packets, prev_n, total = [], None, 0
    granules = []
    for k, mode_idx in enumerate(modes):
        prev_flag = modes[k - 1] if k > 0 else 1
        next_flag = modes[k + 1] if k + 1 < n_packets else 1
        pkt = audio_packet(setup, rng, mode_idx, prev_flag, next_flag)
        n = blocksizes[setup.modes[mode_idx].blockflag]
        if prev_n is not None:
            total += prev_n // 4 + n // 4
        prev_n = n
        packets.append(pkt)
        granules.append(total)

    per_page = 8
    seq = 2
    for i in range(0, len(packets), per_page):
        group = packets[i:i + per_page]
        granule = granules[min(i + per_page - 1, len(packets) - 1)]
        last = i + per_page >= len(packets)
        pages.append(ogg_page(group, serial, seq, granule,
                              0x04 if last else 0))
        seq += 1
    return b"".join(pages)
