#!/usr/bin/env python
"""Attribute the CELT PLC dense-loss drift budget (PARITY.md §2.3).

The round-4 fuzz worst case — CELT 2.5 ms frames with a dense drop
mask — diverged from libopus by up to 0.33 of full scale at ~95
drops.  (r5 re-measurement: the 0.33 no longer reproduces — worst
0.127 over 440 trials across 11 seeds, traced to exponential burst
amplification with zero pitch-search self-divergence through the
burst; the window budget is now 0.35.  See PARITY.md §2.3 for the
packet-level account.)  Two candidate causes:

  (a) near-tied pitch-lag selection: libopus' float32 normalized
      xcorr and our float64 one pick DIFFERENT near-tied lags at some
      fresh conceal, after which both decoders emit valid-but-
      differently-aligned concealment (structural divergence, bounded
      only by signal scale);
  (b) genuine rounding accumulation through the LPC feedback.

This probe separates them by decoding the same dense-loss stream
three ways — libopus, ours (float64 pitch search), ours (float32
pitch search, `celt_plc._PITCH_DTYPE`) — and reporting, per variant:
the drift trajectory vs libopus, the pitch lags chosen at each fresh
conceal, and the SELF-divergence between our two variants.  If the
self-divergence reaches the same magnitude as the libopus divergence
and coincides with a lag flip, the budget is tie-selection noise (a),
which libopus itself exhibits across its own builds — not an
implementation error that more precision could remove.

Usage: python tools/probe_celt_plc_drift.py [n_streams=6] [seed=0]
"""

import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from fuzz_opus_plc_vs_libopus import (  # noqa: E402
    _SR, _encode, _lib, _make_encoder, _signal,
)

from audio_processor_tpu.io.opusdec import celt_plc  # noqa: E402
from audio_processor_tpu.io.opusdec.decoder import OpusDecoder  # noqa: E402


def _libopus_decode(lib, pkts, losses, ch, frame):
    err = ctypes.c_int(0)
    dec = ctypes.c_void_p(lib.opus_decoder_create(
        _SR, ch, ctypes.byref(err)))
    fbuf = np.empty(5760 * ch, np.float32)
    fptr = fbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    out = []
    for i, p in enumerate(pkts):
        if losses[i]:
            n = lib.opus_decode_float(dec, None, 0, fptr, frame, 0)
        else:
            n = lib.opus_decode_float(dec, p, len(p), fptr, 5760, 0)
        assert n > 0, (i, n)
        out.append(fbuf[:n * ch].reshape(n, ch).astype(np.float64))
    lib.opus_decoder_destroy(ctypes.c_void_p(dec.value))
    return out


def _ours_decode(pkts, losses, ch, frame, pitch_dtype):
    old = celt_plc._PITCH_DTYPE
    celt_plc._PITCH_DTYPE = pitch_dtype
    lags = []  # (pkt_index, chosen_lag) at fresh conceals
    real_search = celt_plc.plc_pitch_search

    def spy(decode_mem):
        lag = real_search(decode_mem)
        lags.append(lag)
        return lag

    celt_plc.plc_pitch_search = spy
    # celt.py binds the symbol at import time in some paths — patch
    # via the module reference used by CeltDecoder too.
    import audio_processor_tpu.io.opusdec.celt as celt_mod
    celt_had = getattr(celt_mod, "plc_pitch_search", None)
    if celt_had is not None:
        celt_mod.plc_pitch_search = spy
    try:
        dec = OpusDecoder(ch)
        out = []
        marks = []
        for i, p in enumerate(pkts):
            n0 = len(lags)
            if losses[i]:
                out.append(dec.decode_lost_float(frame))
            else:
                out.append(dec.decode_float(p))
            if len(lags) > n0:
                marks.append((i, lags[-1]))
        return out, marks
    finally:
        celt_plc.plc_pitch_search = real_search
        celt_plc._PITCH_DTYPE = old
        if celt_had is not None:
            celt_mod.plc_pitch_search = celt_had


def _traj(a, b):
    return np.array([float(np.abs(x - y).max()) for x, y in zip(a, b)])


def main(n_streams=6, seed=0):
    lib = _lib()
    assert lib is not None, "libopus unavailable"
    lib.opus_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.opus_encoder_destroy.argtypes = [ctypes.c_void_p]
    rng = np.random.default_rng(seed)
    frame = int(_SR * 2.5) // 1000  # 120 samples: the worst regime

    summary = []
    for s in range(n_streams):
        ch = int(rng.choice([1, 2]))
        kind = str(rng.choice(["speech", "music", "noise", "tone"]))
        br = int(rng.uniform(24000, 96000)) * ch
        cx = int(rng.integers(0, 11))
        pcm = _signal(rng, int(2.0 * _SR), ch, kind)
        enc = _make_encoder(lib, ch, "celt", "FB", br, cx, "audio")
        pkts = _encode(lib, enc, pcm, frame)
        lib.opus_encoder_destroy(enc)
        # dense mask: 8 clean, then 25% iid drops + two 12-frame bursts
        losses = rng.random(len(pkts)) < 0.25
        losses[:8] = False
        for b0 in rng.integers(10, len(pkts) - 14, size=2):
            losses[b0:b0 + 12] = True
        nd = int(losses.sum())

        ref = _libopus_decode(lib, pkts, losses, ch, frame)
        got64, lags64 = _ours_decode(pkts, losses, ch, frame, np.float64)
        got32, lags32 = _ours_decode(pkts, losses, ch, frame, np.float32)

        d64 = _traj(got64, ref)
        d32 = _traj(got32, ref)
        dself = _traj(got64, got32)
        flips = [(i64, a, b) for (i64, a), (_, b) in zip(lags64, lags32)
                 if a != b]
        k = int(np.argmax(d64))
        print(f"s{s} ch={ch} sig={kind} br={br} cx={cx} drops={nd}: "
              f"vs libopus f64={d64.max():.4f}@{k} "
              f"f32={d32.max():.4f} SELF f64-vs-f32={dself.max():.4f} "
              f"lag_flips={len(flips)}/{len(lags64)}", flush=True)
        if flips:
            print(f"   flips (pkt, f64_lag, f32_lag): {flips[:6]}")
            first = flips[0][0]
            pre = dself[:first].max() if first else 0.0
            print(f"   self-div before first flip: {pre:.6f}; "
                  f"after: {dself[first:].max():.4f}")
        summary.append((d64.max(), dself.max(), len(flips)))

    worst_lib = max(x[0] for x in summary)
    worst_self = max(x[1] for x in summary)
    print(f"\nworst vs libopus: {worst_lib:.4f}   "
          f"worst self (pitch dtype only): {worst_self:.4f}   "
          f"streams with lag flips: {sum(1 for x in summary if x[2])}"
          f"/{len(summary)}")
    print("interpretation: self-divergence ~ libopus-divergence ==> "
          "the budget is near-tied lag selection (structural), "
          "not fixable accumulation.")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    main(n, s)
