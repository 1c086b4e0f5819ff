"""Recover the RFC 6716 normative constant tables from a compiled
libopus shared library.

Why this exists: the first-party Opus decoder
(audio_processor_tpu/io/opusdec/) needs the spec's constant tables
(CELT band layout / allocation / energy probability model, SILK iCDFs
/ codebooks / resampler FIRs).  They are normative data published in
RFC 6716 — but this image has no network egress and no opus sources,
only stripped binaries.  The tables still exist byte-for-byte in the
library's .rodata; this module locates them structurally:

- anchor tables whose exact values are known from the spec
  (eband5ms, eMeans, stereo prediction Q13 quant levels, ...) pin
  down the translation-unit regions,
- the CELTMode / kiss_fft / PulseCache / silk_NLSF_CB structs in
  .data.rel.ro are walked via their R_X86_64_RELATIVE relocations,
  which give authoritative addresses for every pointed-to table,
- every recovered table is cross-checked against a second,
  independently compiled libopus (pygame's bundled copy) and must
  match byte-for-byte,
- end-to-end, the decoder built on these tables is validated against
  libopus's own decode output (tests/test_opusdec.py), which would
  catch any mis-extraction.

Run tools/gen_opus_tables.py to regenerate
audio_processor_tpu/io/opusdec/_tables*.py.
"""

from __future__ import annotations

import ctypes.util
import glob
import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

SYSTEM_LIB = "/usr/lib/x86_64-linux-gnu/libopus.so.0.8.0"


def find_libopus_copies() -> List[str]:
    """The system libopus plus any bundled copies (pygame ships one)."""
    out = []
    name = ctypes.util.find_library("opus")
    if name:
        import ctypes as _c
        lib = _c.CDLL(name)
        # resolve the real path via /proc/self/maps after load
    for pat in ("/usr/lib/x86_64-linux-gnu/libopus.so*",
                "/opt/venv/lib/python3.12/site-packages/pygame.libs/"
                "libopus-*.so*"):
        for p in glob.glob(pat):
            if not p.endswith((".so", ".0")) or True:
                if p not in out and not p.endswith(".symbols"):
                    out.append(p)
    # keep only real files (not symlinks duplicating a target)
    import os
    seen, uniq = set(), []
    for p in out:
        rp = os.path.realpath(p)
        if rp not in seen:
            seen.add(rp)
            uniq.append(rp)
    return uniq


@dataclass
class Section:
    name: str
    addr: int
    offset: int
    size: int


class ElfLib:
    """Minimal ELF64 reader: sections, .rodata bytes, RELATIVE relocs."""

    def __init__(self, path: str):
        self.path = path
        self.data = open(path, "rb").read()
        self.sections = self._parse_sections()
        self.relocs = self._parse_relative_relocs()

    def _parse_sections(self) -> Dict[str, Section]:
        d = self.data
        assert d[:4] == b"\x7fELF" and d[4] == 2, "not ELF64"
        e_shoff, = struct.unpack_from("<Q", d, 0x28)
        e_shentsize, e_shnum, e_shstrndx = struct.unpack_from(
            "<HHH", d, 0x3A)
        shdrs = []
        for i in range(e_shnum):
            off = e_shoff + i * e_shentsize
            name_off, _type, _flags, addr, offset, size = \
                struct.unpack_from("<IIQQQQ", d, off)
            shdrs.append((name_off, addr, offset, size))
        str_off = shdrs[e_shstrndx][2]
        out = {}
        for name_off, addr, offset, size in shdrs:
            end = d.index(b"\x00", str_off + name_off)
            name = d[str_off + name_off:end].decode()
            out[name] = Section(name, addr, offset, size)
        return out

    def _parse_relative_relocs(self) -> Dict[int, int]:
        """{reloc target vaddr -> pointed-to vaddr} for R_X86_64_RELATIVE."""
        sec = self.sections.get(".rela.dyn")
        if sec is None:
            return {}
        out = {}
        for off in range(sec.offset, sec.offset + sec.size, 24):
            r_offset, r_info, r_addend = struct.unpack_from(
                "<QQq", self.data, off)
            if r_info & 0xFFFFFFFF == 8:  # R_X86_64_RELATIVE
                out[r_offset] = r_addend
        return out

    def at_vaddr(self, vaddr: int, size: int) -> bytes:
        """Bytes at a virtual address (sections map vaddr==file offset
        only when unbiased; resolve via the containing section)."""
        for s in self.sections.values():
            if s.addr and s.addr <= vaddr < s.addr + s.size:
                off = s.offset + (vaddr - s.addr)
                return self.data[off:off + size]
        raise ValueError(f"vaddr {vaddr:#x} not in any section")

    def ptr_at(self, vaddr: int) -> Optional[int]:
        """Pointer value stored at vaddr (via its relocation)."""
        return self.relocs.get(vaddr)

    def u32(self, vaddr: int) -> int:
        return struct.unpack("<I", self.at_vaddr(vaddr, 4))[0]

    def i32(self, vaddr: int) -> int:
        return struct.unpack("<i", self.at_vaddr(vaddr, 4))[0]

    def f32(self, vaddr: int) -> float:
        return struct.unpack("<f", self.at_vaddr(vaddr, 4))[0]

    def arr(self, vaddr: int, dtype, count: int) -> np.ndarray:
        dt = np.dtype(dtype).newbyteorder("<")
        return np.frombuffer(
            self.at_vaddr(vaddr, dt.itemsize * count), dt).copy()

    def find(self, pattern: bytes, section: str = ".rodata") -> List[int]:
        """All vaddrs in `section` where `pattern` occurs."""
        s = self.sections[section]
        blob = self.data[s.offset:s.offset + s.size]
        out, i = [], 0
        while True:
            j = blob.find(pattern, i)
            if j < 0:
                return out
            out.append(s.addr + j)
            i = j + 1

    def find_one(self, pattern: bytes, section: str = ".rodata") -> int:
        hits = self.find(pattern, section)
        if len(hits) != 1:
            raise ValueError(
                f"pattern not unique in {self.path}: {len(hits)} hits "
                f"{[hex(h) for h in hits]}")
        return hits[0]


# ---------------------------------------------------------------------------
# CELT mode walk
# ---------------------------------------------------------------------------

# Anchors whose exact values are normative (RFC 6716 / static mode
# tables for the 48 kHz / 960-sample Opus mode).
EBAND5MS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28,
            34, 40, 48, 60, 78, 100]
E_MEANS = [6.4375, 6.25, 5.75, 5.3125, 5.0625, 4.8125, 4.5, 4.375,
           4.875, 4.6875, 4.5625, 4.4375, 4.875, 4.625, 4.3125, 4.5,
           4.375, 4.625, 4.75, 4.4375, 3.75]


@dataclass
class CeltMode:
    Fs: int
    overlap: int
    nbEBands: int
    effEBands: int
    preemph: np.ndarray          # float[4]
    eBands: np.ndarray           # int16[nbEBands+1]
    maxLM: int
    nbShortMdcts: int
    shortMdctSize: int
    nbAllocVectors: int
    allocVectors: np.ndarray     # uint8[nbAllocVectors, nbEBands]
    logN: np.ndarray             # int16[nbEBands]
    window: np.ndarray           # float[overlap]
    cache_size: int
    cache_index: np.ndarray      # int16[(maxLM+2)*nbEBands]
    cache_bits: np.ndarray       # uint8[cache_size]
    cache_caps: np.ndarray       # uint8[nbEBands*2*(maxLM+1)]


def locate_celt_mode(lib: ElfLib) -> int:
    """vaddr of the static CELTMode struct (mode48000_960_120).

    Found as the .data.rel.ro location whose first int32 is 48000 and
    whose eBands pointer (offset 32) targets the eband5ms table.
    """
    eband_addr = lib.find_one(struct.pack("<22h", *EBAND5MS))
    sec = lib.sections[".data.rel.ro"]
    for vaddr in range(sec.addr, sec.addr + sec.size - 40, 8):
        try:
            if lib.i32(vaddr) == 48000 and \
                    lib.ptr_at(vaddr + 32) == eband_addr:
                return vaddr
        except ValueError:
            continue
    raise ValueError("CELTMode struct not found")


def read_celt_mode(lib: ElfLib) -> CeltMode:
    m = locate_celt_mode(lib)
    Fs = lib.i32(m)
    overlap = lib.i32(m + 4)
    nbE = lib.i32(m + 8)
    effE = lib.i32(m + 12)
    preemph = lib.arr(m + 16, np.float32, 4)
    eBands = lib.arr(lib.ptr_at(m + 32), np.int16, nbE + 1)
    maxLM = lib.i32(m + 40)
    nbShort = lib.i32(m + 44)
    shortSize = lib.i32(m + 48)
    nbAlloc = lib.i32(m + 52)
    alloc = lib.arr(lib.ptr_at(m + 56), np.uint8,
                    nbAlloc * nbE).reshape(nbAlloc, nbE)
    logN = lib.arr(lib.ptr_at(m + 64), np.int16, nbE)
    window = lib.arr(lib.ptr_at(m + 72), np.float32, overlap)
    # mdct_lookup at m+80: {int n; int maxshift; kfft[4]; trig}  (skip:
    # the decoder computes its IMDCT numerically, no kiss tables used)
    # PulseCache at m+80+48=m+128: {int size; index; bits; caps}
    cache_base = m + 128
    cache_size = lib.i32(cache_base)
    index = lib.arr(lib.ptr_at(cache_base + 8), np.int16,
                    (maxLM + 2) * nbE)
    bits = lib.arr(lib.ptr_at(cache_base + 16), np.uint8, cache_size)
    caps = lib.arr(lib.ptr_at(cache_base + 24), np.uint8,
                   nbE * 2 * (maxLM + 1))
    return CeltMode(Fs, overlap, nbE, effE, preemph, eBands, maxLM,
                    nbShort, shortSize, nbAlloc, alloc, logN, window,
                    cache_size, index, bits, caps)


def read_quant_bands_tables(lib: ElfLib) -> Dict[str, np.ndarray]:
    """quant_bands.c statics.  Located by exact-value anchors: the
    spec's Q15 prediction/beta coefficient arrays (29440/32768, ...),
    the eMeans table, and the e_prob_model first row (72,127,65,...);
    beta_intra (4915/32768) sits right after the eMeans padding."""
    a = lib.find_one(struct.pack("<21f", *E_MEANS))
    e_means = lib.arr(a, np.float32, 25)  # declared [25], 3.75 pad
    if not np.allclose(e_means[21:], 3.75):
        raise ValueError(f"eMeans pad mismatch: {e_means[21:]}")
    pred_coef = lib.arr(lib.find_one(struct.pack(
        "<4f", 29440 / 32768, 26112 / 32768, 21248 / 32768,
        16384 / 32768)), np.float32, 4)
    beta_coef = lib.arr(lib.find_one(struct.pack(
        "<4f", 30147 / 32768, 22282 / 32768, 12124 / 32768,
        6554 / 32768)), np.float32, 4)
    beta_intra = lib.arr(a + 100, np.float32, 1)
    if not np.allclose(beta_intra, 4915 / 32768):
        raise ValueError(f"beta_intra mismatch: {beta_intra}")
    e_prob = lib.arr(lib.find_one(bytes([72, 127, 65, 129, 66, 128])),
                     np.uint8, 4 * 2 * 42).reshape(4, 2, 42)
    return {"e_means": e_means, "pred_coef": pred_coef,
            "beta_coef": beta_coef, "beta_intra": beta_intra,
            "e_prob_model": e_prob}


def cross_check(name: str, a: np.ndarray, b: np.ndarray) -> None:
    if a.shape != b.shape or not np.array_equal(a, b):
        raise ValueError(f"cross-library mismatch for {name}")
