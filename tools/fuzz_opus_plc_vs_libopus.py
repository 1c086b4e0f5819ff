#!/usr/bin/env python
"""Differential loss-pattern fuzz: first-party Opus PLC vs libopus.

Encodes streams with libopus (forced CELT / hybrid / SILK / auto,
several bitrates, frame sizes, mono/stereo, signal kinds), drops
packets per a random mask (independent drops + bursts), and decodes
both with libopus (``opus_decode(dec, NULL, 0, ...)`` for losses) and
the first-party decoder (``OpusDecoder.decode_lost_int16``).
Also fuzzes redundancy-free mode transitions by splicing packets from
two differently-forced encoders into one stream.

Verdict per trial: max abs int16 diff in (a) concealed frames,
(b) the first 3 good frames after each loss, (c) steady-state good
frames.  SILK-mode losses must stay bit-exact in (a); CELT losses are
held to a float tolerance (the PLC is float64 vs libopus float32 —
pitch search and LPC feedback amplify rounding).

Usage: python tools/fuzz_opus_plc_vs_libopus.py [n_trials] [seed]
"""

import ctypes
import ctypes.util
import sys

import numpy as np

_SR = 48000
APP = {"voip": 2048, "audio": 2049, "lowdelay": 2051}
OPUS_SET_BITRATE = 4002
OPUS_SET_BANDWIDTH = 4008
OPUS_SET_COMPLEXITY = 4010
OPUS_SET_INBAND_FEC = 4012
OPUS_SET_PACKET_LOSS_PERC = 4014
OPUS_SET_FORCE_MODE = 11002
MODE = {"silk": 1000, "hybrid": 1001, "celt": 1002}
BW = {"NB": 1101, "MB": 1102, "WB": 1103, "SWB": 1104, "FB": 1105}


def _lib():
    name = ctypes.util.find_library("opus")
    if not name:
        return None
    lib = ctypes.CDLL(name)
    lib.opus_decode_float.restype = ctypes.c_int
    lib.opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.opus_decode.restype = ctypes.c_int
    lib.opus_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int, ctypes.c_int]
    lib.opus_encode_float.restype = ctypes.c_int32
    lib.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int32]
    return lib


def _signal(rng, n, ch, kind):
    t = np.arange(n) / _SR
    if kind == "speech":
        f0 = 120 + 40 * np.sin(2 * np.pi * 2.1 * t)
        x = np.sin(2 * np.pi * np.cumsum(f0) / _SR)
        x *= 0.4 + 0.3 * np.sin(2 * np.pi * 3.7 * t)
        x += 0.02 * rng.standard_normal(n)
    elif kind == "music":
        x = sum(a * np.sin(2 * np.pi * f * t) for a, f in
                ((0.3, 220), (0.2, 331), (0.15, 442), (0.1, 881)))
        x += 0.05 * rng.standard_normal(n)
    elif kind == "noise":
        x = 0.3 * rng.standard_normal(n)
    else:  # tone with silence gaps
        x = 0.5 * np.sin(2 * np.pi * 300 * t)
        x[n // 3:n // 2] = 0.0
    x = np.clip(x, -0.95, 0.95).astype(np.float32)
    if ch == 2:
        x = np.stack([x, np.roll(x, 480) * 0.8], axis=1)
    else:
        x = x[:, None]
    return np.ascontiguousarray(x)


def _make_encoder(lib, ch, mode, bw, bitrate, complexity, app, fec=0):
    err = ctypes.c_int(0)
    enc = ctypes.c_void_p(lib.opus_encoder_create(
        _SR, ch, APP[app], ctypes.byref(err)))
    assert err.value == 0
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BITRATE),
                         ctypes.c_int32(bitrate))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_COMPLEXITY),
                         ctypes.c_int32(complexity))
    if mode != "auto":
        lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BANDWIDTH),
                             ctypes.c_int32(BW[bw]))
        lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_FORCE_MODE),
                             ctypes.c_int32(MODE[mode]))
    if fec:
        lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_INBAND_FEC),
                             ctypes.c_int32(1))
        lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_PACKET_LOSS_PERC),
                             ctypes.c_int32(20))
    return enc


def _encode(lib, enc, pcm, frame):
    out = ctypes.create_string_buffer(8000)
    pkts = []
    for i in range(len(pcm) // frame):
        fr = np.ascontiguousarray(pcm[i * frame:(i + 1) * frame])
        nb = lib.opus_encode_float(
            enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, out, len(out))
        assert nb > 0
        pkts.append(out.raw[:nb])
    return pkts


def run_stream(lib, pkts, losses, ch, frame, desc, budgets,
               mode_at=None):
    """Decode pkts with the loss mask through both decoders' FLOAT
    APIs; return per-category worst diffs. losses[i] True = lost.

    Float, not int16: the int16 path's opus_pcm_soft_clip is a
    quadratic waveshaper whose coefficient depends on the lobe peak,
    so on concealed audio that exceeds full scale it amplifies a
    ~1e-4 float drift into thousands of int16 LSB (measured pkt-level:
    float diff 4e-6, int16 diff 4210). Budgets (fractions of full
    scale): SILK loss paths are bit-exact (incl. the post-loss
    BWE_AFTER_LOSS LPC expansion and LastGainIndex reset); CELT PLC is
    float-exact per frame but long concealment chains accumulate
    float64-vs-float32 drift (measured <=0.05 worst over an 89-drop
    2.5 ms stream), hence the wider in-window budget."""
    from audio_processor_tpu.io.opusdec.decoder import OpusDecoder

    err = ctypes.c_int(0)
    dec = ctypes.c_void_p(lib.opus_decoder_create(
        _SR, ch, ctypes.byref(err)))
    fbuf = np.empty(5760 * ch, np.float32)
    fptr = fbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    mine = OpusDecoder(ch)
    # Categories: "concealed" = a loss arriving on clean state (>= 8
    # good frames since the last loss) — concealment semantics must
    # track libopus closely here. "window" = concealed or good frames
    # within 8 frames of a loss — covered by the documented post-loss
    # divergence (PARITY.md: the first good SILK frames after a loss
    # deviate, then decay), budgeted only against blowup. "good" =
    # steady state — must reconverge.
    worst = {"concealed": 0.0, "window": 0.0, "good": 0.0}
    where = {"concealed": -1, "window": -1, "good": -1}
    # time-based window: the documented post-loss divergence decays
    # back to parity within ~0.3 s (PARITY.md); concealment is held to
    # the strict budget only when the SLOW estimator states (CNG
    # gain/NLSF smoothers, ~14-frame time constant) have also had time
    # to re-track — 1 s since the last loss.
    win_frames = max(8, int(0.3 * _SR / frame))
    fresh_frames = max(win_frames, int(1.0 * _SR / frame))
    since_loss = 10 ** 6
    fails = []
    for i, p in enumerate(pkts):
        if losses[i]:
            n = lib.opus_decode_float(dec, None, 0, fptr, frame, 0)
            assert n > 0, (desc, i, n)
            ref = fbuf[:n * ch].reshape(n, ch).astype(np.float64)
            got = mine.decode_lost_float(frame)
            cat = "concealed" if since_loss >= fresh_frames else "window"
            since_loss = 0
        else:
            n = lib.opus_decode_float(dec, p, len(p), fptr, 5760, 0)
            assert n > 0, (desc, i, n)
            ref = fbuf[:n * ch].reshape(n, ch).astype(np.float64)
            got = mine.decode_float(p)
            since_loss += 1
            cat = "window" if since_loss <= win_frames else "good"
        if got.shape != ref.shape:
            fails.append(f"pkt{i}: shape {got.shape} vs {ref.shape}")
            break
        d = float(np.abs(got - ref).max())
        if d > worst[cat]:
            worst[cat] = d
            where[cat] = i
    lib.opus_decoder_destroy(ctypes.c_void_p(dec.value))
    ok = not fails and all(worst[k] <= budgets[k] for k in worst)
    tag = "ok" if ok else "FAIL"
    print(f"{tag} {desc} -> " + " ".join(
        f"{k}={worst[k]:.5f}@{where[k]}" for k in worst)
        + (f" {fails}" if fails else ""))
    return ok


def run(n_trials=40, seed=0):
    sys.path.insert(0, ".")
    lib = _lib()
    assert lib is not None, "libopus unavailable"
    lib.opus_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.opus_encoder_destroy.argtypes = [ctypes.c_void_p]
    rng = np.random.default_rng(seed)
    failures = 0

    for trial in range(n_trials):
        ch = int(rng.choice([1, 2]))
        scenario = str(rng.choice(["loss", "loss", "transition"]))
        kind = str(rng.choice(["speech", "music", "noise", "tone"]))
        complexity = int(rng.integers(0, 11))
        if scenario == "loss":
            mode = str(rng.choice(["celt", "hybrid", "silk", "auto"]))
            if mode == "silk":
                bw, frame_ms = str(rng.choice(["NB", "MB", "WB"])), \
                    float(rng.choice([10, 20, 40, 60]))
                app = "voip"
            elif mode == "hybrid":
                bw, frame_ms = str(rng.choice(["SWB", "FB"])), \
                    float(rng.choice([10, 20]))
                app = "voip"
            else:
                bw, frame_ms = str(rng.choice(list(BW))), \
                    float(rng.choice([2.5, 5, 10, 20]))
                app = str(rng.choice(["audio", "lowdelay"]))
            bitrate = int(rng.uniform(16000, 128000)) * ch
            frame = int(_SR * frame_ms) // 1000
            pcm = _signal(rng, int(1.5 * _SR), ch, kind)
            enc = _make_encoder(lib, ch, mode, bw, bitrate, complexity,
                                app)
            pkts = _encode(lib, enc, pcm, frame)
            lib.opus_encoder_destroy(enc)
            # loss mask: warm-up clean, then drops incl. a burst
            losses = rng.random(len(pkts)) < 0.15
            losses[:8] = False
            b0 = int(rng.integers(10, max(11, len(pkts) - 6)))
            blen = int(rng.integers(1, 7))
            losses[b0:b0 + blen] = True
            desc = (f"t{trial} loss ch={ch} mode={mode} bw={bw} "
                    f"ms={frame_ms} br={bitrate} cx={complexity} "
                    f"sig={kind} drops={int(losses.sum())}")
            if mode == "silk":
                # SILK loss paths are BIT-EXACT end to end: concealed
                # frames, loss clusters, the post-loss window and
                # steady state (CNG partial synth-state reset,
                # BWE_AFTER_LOSS/LastGainIndex, and the mid-only
                # side-channel reset-on-loss are all ported).
                budgets = {"concealed": 0.0, "window": 0.0,
                           "good": 0.0}
            else:
                # CELT/hybrid/auto: concealment is float — a fresh
                # conceal on noise-like content can pick a DIFFERENT
                # near-tied pitch lag than libopus' float32 xcorr
                # (measured 0.03 of full scale on a noise stream, and
                # our own float64-vs-float32 pitch searches flip a
                # harmonic tie 480 vs 320 on a tone — libopus flips
                # the same ties across its own builds). In-window
                # drift is EXPONENTIAL BURST AMPLIFICATION, traced
                # packet-by-packet in r5 (seed-11 t38: consecutive
                # conceals diverge 0.001 -> 0.078 -> 0.127, x1.6 per
                # conceal, then reconverge to 1e-5 within 8 frames;
                # zero pitch-search self-divergence through the burst
                # — tools/probe_celt_plc_drift.py): each conceal's
                # 1e-3-scale float drift feeds the NEXT conceal's
                # excitation energy/decay estimates, compounding
                # multiplicatively over a burst. Bounded by the
                # explosion guard + fade^k attenuation; worst
                # observed 0.127 over 440 trials (11 seeds). Steady
                # state must stay tight. NOTE: file decode NEVER
                # invokes PLC (decode_lost has no caller in io/ —
                # intact Ogg files lose no packets); these budgets
                # scope the streaming/robustness surface only.
                budgets = {"concealed": 0.08, "window": 0.35,
                           "good": 5e-3}
            if not run_stream(lib, pkts, losses, ch, frame, desc,
                              budgets):
                failures += 1
        else:
            # mode-transition splice: two forced encoders, packets
            # butt-joined (same frame size so granules line up)
            frame_ms = float(rng.choice([10, 20]))
            frame = int(_SR * frame_ms) // 1000
            m1, m2 = rng.choice(
                [("celt", "silk"), ("silk", "celt"),
                 ("celt", "hybrid"), ("hybrid", "celt")])
            bw1 = "FB" if m1 in ("celt", "hybrid") else "WB"
            bw2 = "FB" if m2 in ("celt", "hybrid") else "WB"
            br = int(rng.uniform(12000, 64000)) * ch
            pcm = _signal(rng, int(1.0 * _SR), ch, kind)
            e1 = _make_encoder(lib, ch, m1, bw1, br, complexity,
                               "voip" if m1 != "celt" else "audio")
            e2 = _make_encoder(lib, ch, m2, bw2, br, complexity,
                               "voip" if m2 != "celt" else "audio")
            half = len(pcm) // 2 // frame * frame
            pkts = _encode(lib, e1, pcm[:half], frame) + \
                _encode(lib, e2, pcm[half:], frame)
            lib.opus_encoder_destroy(e1)
            lib.opus_encoder_destroy(e2)
            losses = np.zeros(len(pkts), bool)
            if rng.random() < 0.5:  # loss adjacent to the boundary
                k = half // frame + int(rng.integers(-2, 2))
                if 0 <= k < len(pkts):
                    losses[k] = True
            desc = (f"t{trial} transition ch={ch} {m1}->{m2} "
                    f"ms={frame_ms} br={br} cx={complexity} sig={kind} "
                    f"drops={int(losses.sum())}")
            budgets = {"concealed": 1e-3, "window": 0.15,
                       "good": 5e-3}
            if not run_stream(lib, pkts, losses, ch, frame, desc,
                              budgets):
                failures += 1

    print(f"\n{n_trials} trials, {failures} failures")
    return failures


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sys.exit(1 if run(n, s) else 0)
