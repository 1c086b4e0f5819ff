"""First-party FLAC encoder for decoder fixtures (tests only).

Emits spec-valid FLAC streams (RFC 9639) with explicit control over
every bitstream feature the decoder must handle: subframe type
(CONSTANT / VERBATIM / FIXED 0-4 / LPC), rice partition order and
RICE2 escape partitions, wasted bits, stereo decorrelation mode
(independent / left-side / right-side / mid-side), block size and
bits-per-sample, plus the Ogg-FLAC mapping (RFC 5334). Residuals are
computed with the exact integer semantics the decoder inverts, so
round-trips are sample-exact by construction; cross-checks against
pygame/SDL's FLAC loader in tests/test_flac.py keep the encoder
itself honest.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from audio_processor_tpu.io.flac import crc8, crc16

_BLOCK_SIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                     256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                     8192: 13, 16384: 14, 32768: 15}
_SAMPLE_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4,
                      16000: 5, 22050: 6, 24000: 7, 32000: 8,
                      44100: 9, 48000: 10, 96000: 11}
_SAMPLE_SIZE_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int):
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def getvalue(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _utf8_coded(w: BitWriter, v: int):
    if v < 0x80:
        w.write(v, 8)
        return
    # count 6-bit payload groups beyond the leading byte
    n = 1
    while v >> (6 * n + (6 - n)):
        n += 1
    lead_bits = 6 - n
    w.write((0xFF << (lead_bits + 1)) & 0xFF | (v >> (6 * n)), 8)
    for i in range(n - 1, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _zigzag(r: np.ndarray) -> np.ndarray:
    r = r.astype(np.int64)
    return np.where(r >= 0, r << 1, ((-r) << 1) - 1)


def _write_rice(w: BitWriter, res: np.ndarray, order: int,
                n: int, part_order: int,
                escape_parts: Sequence[int] = (),
                rice2: bool = False):
    """Residual coding: method, partition order, one rice parameter
    per partition (or an escape partition of raw signed values)."""
    w.write(1 if rice2 else 0, 2)
    pbits = 5 if rice2 else 4
    escape = (1 << pbits) - 1
    w.write(part_order, 4)
    n_part = 1 << part_order
    off = 0
    for i in range(n_part):
        cnt = (n >> part_order) - (order if i == 0 else 0)
        part = res[off:off + cnt]
        off += cnt
        if i in escape_parts:
            width = max((int(v).bit_length() + 1 for v in part),
                        default=1)
            width = min(width, 31)
            w.write(escape, pbits)
            w.write(width, 5)
            for v in part:
                w.write(int(v) & ((1 << width) - 1), width)
            continue
        u = _zigzag(part)
        mean = int(u.mean()) if len(u) else 0
        k = max(0, mean.bit_length() - 1)
        k = min(k, escape - 1)
        w.write(k, pbits)
        for uv in u:
            w.write_unary(int(uv) >> k)
            w.write(int(uv), k)


def _write_subframe(w: BitWriter, x: np.ndarray, bps: int,
                    plan, part_order: int,
                    escape_parts: Sequence[int] = (),
                    rice2: bool = False, wasted: int = 0):
    """``plan``: "constant" | "verbatim" | ("fixed", order) |
    ("lpc", order, shift)."""
    n = len(x)
    if wasted:
        assert not np.any(x & ((1 << wasted) - 1)), \
            "wasted-bits plan requires zero low bits"
        x = x >> wasted
    eff = bps - wasted
    w.write(0, 1)                        # mandatory zero pad bit
    if plan == "constant":
        w.write(0, 6)
    elif plan == "verbatim":
        w.write(1, 6)
    elif plan[0] == "fixed":
        w.write(8 + plan[1], 6)
    else:
        w.write(32 + plan[1] - 1, 6)
    if wasted:
        w.write(1, 1)
        w.write(1, wasted)               # unary: (wasted-1) zeros, 1
    else:
        w.write(0, 1)
    if plan == "constant":
        assert np.all(x == x[0])
        w.write(int(x[0]), eff)
        return
    if plan == "verbatim":
        for v in x:
            w.write(int(v), eff)
        return
    if plan[0] == "fixed":
        order = plan[1]
        for v in x[:order]:
            w.write(int(v), eff)
        res = x.astype(np.int64)
        for _ in range(order):
            res = np.diff(res)
        _write_rice(w, res, order, n, part_order, escape_parts, rice2)
        return
    order, shift = plan[1], plan[2]
    coefs = _fit_lpc(x, order, shift)
    for v in x[:order]:
        w.write(int(v), eff)
    prec = max(c.bit_length() + 1 for c in map(int, map(abs, coefs)))
    prec = max(2, min(prec, 15))
    w.write(prec - 1, 4)
    w.write(shift, 5)
    for c in coefs:
        w.write(int(c), prec)
    xs = x.astype(object)                # exact Python-int arithmetic
    res = []
    for i in range(order, n):
        acc = 0
        for j, c in enumerate(coefs):
            acc += int(c) * int(xs[i - 1 - j])
        res.append(int(xs[i]) - (acc >> shift))
    _write_rice(w, np.array(res, np.int64), order, n, part_order,
                escape_parts, rice2)


def _fit_lpc(x: np.ndarray, order: int, shift: int) -> List[int]:
    """Quantized LPC coefficients via least squares, clamped to 14
    bits; any coefficient set is decodable, the fit just keeps
    residuals small."""
    xf = x.astype(np.float64)
    if len(xf) <= order + 4 or np.allclose(xf, xf[0]):
        coefs = np.zeros(order)
        coefs[0] = 1.0
    else:
        cols = [xf[order - 1 - j:len(xf) - 1 - j] for j in range(order)]
        A = np.stack(cols, axis=1)
        b = xf[order:]
        coefs, *_ = np.linalg.lstsq(A, b, rcond=None)
    q = np.round(coefs * (1 << shift)).astype(np.int64)
    return [int(np.clip(v, -(1 << 13), (1 << 13) - 1)) for v in q]


def encode_frame(samples: np.ndarray, frame_idx: int, sample_rate: int,
                 bps: int, *, ch_mode: str = "independent",
                 plan="verbatim", part_order: int = 0,
                 escape_parts: Sequence[int] = (), rice2: bool = False,
                 wasted: int = 0, stream_bps: Optional[int] = None,
                 stream_rate: Optional[int] = None) -> bytes:
    """One FLAC frame. ``samples``: [n, ch] int. ``ch_mode``:
    independent|left_side|right_side|mid_side. ``stream_bps`` /
    ``stream_rate``: the STREAMINFO values — when they differ from
    ``bps``/``sample_rate`` the frame header carries explicit codes."""
    n, ch = samples.shape
    w = BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(0, 1)                        # fixed blocksize strategy
    bs_code = _BLOCK_SIZE_CODES.get(n)
    bs_tail: Optional[Tuple[int, int]] = None
    if bs_code is None:
        if n <= 256:
            bs_code, bs_tail = 6, (n - 1, 8)
        else:
            bs_code, bs_tail = 7, (n - 1, 16)
    w.write(bs_code, 4)
    sr_tail: Optional[Tuple[int, int]] = None
    if stream_rate is not None and sample_rate != stream_rate:
        if sample_rate % 1000 == 0 and sample_rate // 1000 < 256:
            sr_code, sr_tail = 12, (sample_rate // 1000, 8)
        else:
            sr_code, sr_tail = 13, (sample_rate, 16)
    elif sample_rate in _SAMPLE_RATE_CODES and stream_rate is None:
        sr_code = _SAMPLE_RATE_CODES[sample_rate]
    else:
        sr_code = 0                      # = STREAMINFO
    w.write(sr_code, 4)
    if ch_mode == "independent":
        w.write(ch - 1, 4)
    else:
        assert ch == 2
        w.write({"left_side": 8, "right_side": 9,
                 "mid_side": 10}[ch_mode], 4)
    if stream_bps is not None and bps != stream_bps:
        w.write(_SAMPLE_SIZE_CODES[bps], 3)
    else:
        w.write(0, 3)                    # = STREAMINFO
    w.write(0, 1)
    _utf8_coded(w, frame_idx)
    if bs_tail:
        w.write(*bs_tail)
    if sr_tail:
        w.write(*sr_tail)
    w.align()
    hdr = w.getvalue()
    w = BitWriter()
    for b in hdr:
        w.write(b, 8)
    w.write(crc8(hdr), 8)

    def sub(x, sub_bps, sub_plan):
        _write_subframe(w, x.astype(np.int64), sub_bps, sub_plan,
                        part_order, escape_parts, rice2, wasted)

    plans = plan if isinstance(plan, list) else [plan] * ch
    if ch_mode == "independent":
        for c in range(ch):
            sub(samples[:, c], bps, plans[c])
    else:
        left = samples[:, 0].astype(np.int64)
        right = samples[:, 1].astype(np.int64)
        side = left - right
        if ch_mode == "left_side":
            sub(left, bps, plans[0])
            sub(side, bps + 1, plans[1])
        elif ch_mode == "right_side":
            sub(side, bps + 1, plans[0])
            sub(right, bps, plans[1])
        else:
            mid = (left + right) >> 1
            sub(mid, bps, plans[0])
            sub(side, bps + 1, plans[1])
    w.align()
    body = w.getvalue()
    return body + struct.pack(">H", crc16(body))


def streaminfo(block_size: int, sample_rate: int, ch: int, bps: int,
               total: int, md5: bytes) -> bytes:
    out = struct.pack(">HH", block_size, block_size)
    out += (0).to_bytes(3, "big") * 2    # min/max frame size unknown
    packed = (sample_rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) \
        | total
    out += packed.to_bytes(8, "big")
    return out + md5


def _max_order(plan) -> int:
    plans = plan if isinstance(plan, list) else [plan]
    orders = [p[1] for p in plans if isinstance(p, tuple)]
    return max(orders, default=0)


def _fit_part_order(kw: dict, n: int):
    """Adapt the frame plan to short tail frames: partitions must
    divide the count, the first partition must survive the warmup
    samples, and a frame shorter than the predictor order can't use
    the predictor at all."""
    if n <= _max_order(kw.get("plan", "verbatim")):
        kw["plan"] = "verbatim"
    po = kw.get("part_order", 0)
    if n % (1 << po) or (n >> po) <= _max_order(kw.get("plan",
                                                       "verbatim")):
        kw["part_order"] = 0
        kw.pop("escape_parts", None)


def _md5(samples: np.ndarray, bps: int) -> bytes:
    if bps % 8:
        return b"\x00" * 16
    width = bps // 8
    inter = samples.reshape(-1).astype("<i4").tobytes()
    if width == 4:
        raw = inter
    else:
        b = np.frombuffer(inter, np.uint8).reshape(-1, 4)
        raw = b[:, :width].tobytes()
    return hashlib.md5(raw).digest()


def encode_flac(samples: np.ndarray, sample_rate: int, bps: int,
                block_size: int = 1024, with_md5: bool = True,
                extra_metadata: bool = False, **frame_kw) -> bytes:
    """[n, ch] int samples -> complete FLAC stream. Frames take
    ``frame_kw`` (ch_mode / plan / part_order / ...); a short tail
    frame gets an 8/16-bit coded block size automatically."""
    n, ch = samples.shape
    md5 = _md5(samples, bps) if with_md5 else b"\x00" * 16
    out = bytearray(b"fLaC")
    si = streaminfo(block_size, sample_rate, ch, bps, n, md5)
    last = not extra_metadata
    out += bytes([(0x80 if last else 0) | 0]) + len(si).to_bytes(3, "big")
    out += si
    if extra_metadata:                   # a PADDING and a VORBIS_COMMENT
        pad = b"\x00" * 16
        out += bytes([1]) + len(pad).to_bytes(3, "big") + pad
        vc = struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
        out += bytes([0x84]) + len(vc).to_bytes(3, "big") + vc
    for i, off in enumerate(range(0, n, block_size)):
        frame = samples[off:off + block_size]
        kw = dict(frame_kw)
        _fit_part_order(kw, len(frame))
        out += encode_frame(frame, i, sample_rate, bps, **kw)
    return bytes(out)


# ------------------------------------------------------- Ogg mapping

def _ogg_page(serial: int, seq: int, granule: int, packets,
              bos=False, eos=False) -> bytes:
    segs = bytearray()
    body = bytearray()
    for pkt in packets:
        L = len(pkt)
        while True:
            segs.append(min(L, 255))
            if L < 255:
                break
            L -= 255
    for pkt in packets:
        body += pkt
    hdr = struct.pack("<4sBBqIIIB", b"OggS", 0,
                      (2 if bos else 0) | (4 if eos else 0),
                      granule, serial, seq, 0, len(segs))
    page = bytearray(hdr + bytes(segs) + bytes(body))
    crc = _ogg_crc(bytes(page))
    struct.pack_into("<I", page, 22, crc)
    return bytes(page)


_OGG_CRC_TABLE = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _c & 0x80000000 \
            else (_c << 1) & 0xFFFFFFFF
    _OGG_CRC_TABLE.append(_c)


def _ogg_crc(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((c >> 24) ^ b)
                                                     & 0xFF]
    return c


def encode_ogg_flac(samples: np.ndarray, sample_rate: int, bps: int,
                    block_size: int = 1024, serial: int = 0x464C4143,
                    **frame_kw) -> bytes:
    """Wrap FLAC frames in the RFC 5334 Ogg mapping: BOS page with the
    0x7F FLAC header packet, one comment header, then one frame per
    page with the running granule position."""
    n, ch = samples.shape
    md5 = _md5(samples, bps)
    si = streaminfo(block_size, sample_rate, ch, bps, n, md5)
    id_pkt = (b"\x7fFLAC\x01\x00" + struct.pack(">H", 1) + b"fLaC"
              + bytes([0x00]) + len(si).to_bytes(3, "big") + si)
    vc = struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    vc_pkt = bytes([0x84]) + len(vc).to_bytes(3, "big") + vc
    pages = [_ogg_page(serial, 0, 0, [id_pkt], bos=True),
             _ogg_page(serial, 1, 0, [vc_pkt])]
    seq = 2
    done = 0
    offs = list(range(0, n, block_size))
    for i, off in enumerate(offs):
        frame = samples[off:off + block_size]
        done += len(frame)
        kw = dict(frame_kw)
        _fit_part_order(kw, len(frame))
        pkt = encode_frame(frame, i, sample_rate, bps, **kw)
        pages.append(_ogg_page(serial, seq, done, [pkt],
                               eos=(i == len(offs) - 1)))
        seq += 1
    return b"".join(pages)
