"""Differential fuzz: the first-party Opus decoder vs libopus across
random encoder configurations.

Each trial draws an encoder setup (application, bitrate, bandwidth,
frame size, channels, complexity, FEC, forced mode or auto), encodes
a random signal, and asserts the first-party decode stays within
1 int16 LSB of libopus per packet (bit-exact for SILK).  A second
pass feeds the packets through libopus' repacketizer to produce
multi-frame code-3 packets, covering framing the encoder itself
rarely emits.

Usage: python tools/fuzz_opusdec_vs_libopus.py [n_trials] [seed]
"""

from __future__ import annotations

import ctypes
import ctypes.util
import sys

import numpy as np

_SR = 48000
APP = {"voip": 2048, "audio": 2049, "lowdelay": 2051}
BW = {"NB": 1101, "MB": 1102, "WB": 1103, "SWB": 1104, "FB": 1105}
MODE = {"silk": 1000, "hybrid": 1001, "celt": 1002, "auto": -1000}
OPUS_SET_BITRATE = 4002
OPUS_SET_COMPLEXITY = 4010
OPUS_SET_BANDWIDTH = 4008
OPUS_SET_INBAND_FEC = 4012
OPUS_SET_PACKET_LOSS_PERC = 4014
OPUS_SET_FORCE_MODE = 11002


def _lib():
    lib = ctypes.CDLL(ctypes.util.find_library("opus"))
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.opus_encode_float.restype = ctypes.c_int32
    lib.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int32]
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.opus_decode.restype = ctypes.c_int
    lib.opus_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int, ctypes.c_int]
    lib.opus_repacketizer_create.restype = ctypes.c_void_p
    lib.opus_repacketizer_cat.restype = ctypes.c_int
    lib.opus_repacketizer_cat.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32]
    lib.opus_repacketizer_out.restype = ctypes.c_int32
    lib.opus_repacketizer_out.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32]
    return lib


def _signal(rng, n, ch, kind):
    t = np.arange(n) / _SR
    out = np.zeros((n, ch), np.float32)
    for c in range(ch):
        if kind == "speech":
            f0 = rng.uniform(80, 220)
            s = sum(np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6)) / h
                    for h in range(1, 10))
            env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.8, 2.5) * t)
            out[:, c] = 0.3 * s * env + 0.02 * rng.standard_normal(n)
        elif kind == "music":
            for _ in range(4):
                out[:, c] += rng.uniform(0.05, 0.3) * np.sin(
                    2 * np.pi * rng.uniform(100, 8000) * t
                    + rng.uniform(0, 6))
            out[:, c] += 0.03 * rng.standard_normal(n)
        elif kind == "clicks":
            out[:, c] = 0.02 * rng.standard_normal(n)
            for p in range(0, n, int(rng.uniform(1500, 4000))):
                w = min(120, n - p)
                out[p:p + w, c] += rng.standard_normal(w) * 0.8
        elif kind == "sparse":
            out[:, c] = 0.0
            seg = n // 3
            out[seg:2 * seg, c] = 0.4 * np.sin(
                2 * np.pi * 300 * t[seg:2 * seg])
        else:  # hot
            out[:, c] = np.clip(2.5 * np.sin(2 * np.pi * 500 * t)
                                + rng.standard_normal(n) * 0.3, -1, 1)
    return np.clip(out, -0.999, 0.999)


def run(n_trials: int = 60, seed: int = 0) -> int:
    sys.path.insert(0, ".")
    from audio_processor_tpu.io.opusdec.decoder import OpusDecoder

    lib = _lib()
    rng = np.random.default_rng(seed)
    failures = 0
    for trial in range(n_trials):
        ch = int(rng.choice([1, 2]))
        mode = str(rng.choice(["silk", "hybrid", "celt", "auto"]))
        app = "voip" if mode in ("silk", "hybrid") \
            else str(rng.choice(list(APP)))
        if mode == "silk":
            bw = str(rng.choice(["NB", "MB", "WB"]))
            frame_ms = float(rng.choice([10, 20, 40, 60]))
        elif mode == "hybrid":
            bw = str(rng.choice(["SWB", "FB"]))
            frame_ms = float(rng.choice([10, 20]))
        else:
            bw = str(rng.choice(list(BW)))
            frame_ms = float(rng.choice([2.5, 5, 10, 20]))
        bitrate = int(rng.uniform(6000, 128000)) * ch
        complexity = int(rng.integers(0, 11))
        fec = int(rng.random() < 0.4 and mode in ("silk", "hybrid",
                                                  "auto"))
        kind = str(rng.choice(["speech", "music", "clicks", "sparse",
                               "hot"]))
        repack = bool(rng.random() < 0.3 and frame_ms in (2.5, 5, 10,
                                                          20))
        desc = (f"t{trial}: ch={ch} mode={mode} bw={bw} ms={frame_ms} "
                f"br={bitrate} cx={complexity} fec={fec} sig={kind} "
                f"repack={repack}")

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
            lib.opus_encoder_ctl(
                enc, ctypes.c_int(OPUS_SET_PACKET_LOSS_PERC),
                ctypes.c_int32(int(rng.integers(5, 40))))

        frame = int(_SR * frame_ms) // 1000
        pcm = _signal(rng, int(1.2 * _SR), ch, kind)
        out = ctypes.create_string_buffer(8000)
        pkts = []
        for i in range(len(pcm) // frame):
            fr = np.ascontiguousarray(pcm[i * frame:(i + 1) * frame])
            nb = lib.opus_encode_float(
                enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                frame, out, len(out))
            assert nb > 0
            pkts.append(out.raw[:nb])
        lib.opus_encoder_destroy(ctypes.c_void_p(enc.value))

        if repack:
            # merge runs of packets into multi-frame code-3 packets
            merged = []
            i = 0
            while i < len(pkts):
                k = int(rng.integers(1, 1 + min(
                    6, len(pkts) - i, int(120 / frame_ms))))
                rp = ctypes.c_void_p(lib.opus_repacketizer_create())
                ok = True
                for p in pkts[i:i + k]:
                    if lib.opus_repacketizer_cat(rp, p, len(p)) != 0:
                        ok = False
                        break
                if ok:
                    buf = ctypes.create_string_buffer(16000)
                    nb = lib.opus_repacketizer_out(rp, buf, len(buf))
                    assert nb > 0
                    merged.append(buf.raw[:nb])
                else:
                    merged.extend(pkts[i:i + k])
                lib.opus_repacketizer_destroy(ctypes.c_void_p(rp.value))
                i += k
            pkts = merged

        dec = ctypes.c_void_p(lib.opus_decoder_create(
            _SR, ch, ctypes.byref(err)))
        buf = np.empty(5760 * ch, np.int16)
        mine = OpusDecoder(ch)
        worst = 0
        bad_at = -1
        for i, p in enumerate(pkts):
            n = lib.opus_decode(
                dec, p, len(p),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                5760, 0)
            assert n > 0, (desc, i, n)
            ref = buf[:n * ch].reshape(n, ch).astype(np.int32)
            try:
                got = mine.decode_int16(p).astype(np.int32)
            except Exception as e:
                print(f"FAIL {desc} pkt{i}: {type(e).__name__}: {e}")
                failures += 1
                bad_at = i
                break
            if got.shape != ref.shape:
                print(f"FAIL {desc} pkt{i}: shape {got.shape} vs "
                      f"{ref.shape}")
                failures += 1
                bad_at = i
                break
            d = int(np.abs(got - ref).max())
            if d > worst:
                worst = d
                bad_at = i
        lib.opus_decoder_destroy(ctypes.c_void_p(dec.value))
        status = "ok" if worst <= 1 else f"DIFF={worst}@pkt{bad_at}"
        if worst > 1:
            failures += 1
        print(f"{desc} -> {status} ({len(pkts)} pkts)")
    print(f"\n{n_trials} trials, {failures} failures")
    return failures


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sys.exit(1 if run(n, seed) else 0)
