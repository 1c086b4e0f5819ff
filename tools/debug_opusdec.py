"""Debug harness for the first-party Opus decoder: encodes synthetic
audio with the system libopus encoder in forced modes, decodes every
packet with both libopus (int16 API) and audio_processor_tpu's
opusdec, and reports the first divergence.

Usage: python tools/debug_opusdec.py [silk|celt|hybrid] [mono|stereo]
"""

from __future__ import annotations

import ctypes
import ctypes.util
import sys

import numpy as np

_SR = 48000
OPUS_APPLICATION_VOIP = 2048
OPUS_APPLICATION_AUDIO = 2049
OPUS_SET_BITRATE = 4002
OPUS_SET_MAX_BANDWIDTH = 4004
OPUS_SET_BANDWIDTH = 4008
OPUS_SET_COMPLEXITY = 4010
OPUS_SET_INBAND_FEC = 4012
OPUS_SET_DTX = 4016
OPUS_SET_SIGNAL = 4024
OPUS_SIGNAL_VOICE = 3001
OPUS_SET_FORCE_MODE = 11002          # private but stable request id
MODE_SILK_ONLY = 1000
MODE_HYBRID = 1001
MODE_CELT_ONLY = 1002
BW = {"NB": 1101, "MB": 1102, "WB": 1103, "SWB": 1104, "FB": 1105}


def load():
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
    return lib


def speechy(n, channels, seed=0):
    """Synthetic voiced-ish signal: pitch pulses through formants."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / _SR
    out = np.zeros((n, channels), np.float32)
    for c in range(channels):
        f0 = 110.0 + 40 * c
        sig = np.zeros(n)
        for h in range(1, 12):
            sig += np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6)) / h
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t + c)
        noise = rng.standard_normal(n) * 0.02
        out[:, c] = (0.3 * sig * env + noise).astype(np.float32)
    return np.clip(out, -0.99, 0.99)


def encode_packets(pcm, channels, mode="silk", bw="WB", bitrate=24000,
                   frame_ms=20, complexity=10, dtx=0):
    lib = load()
    err = ctypes.c_int(0)
    app = OPUS_APPLICATION_VOIP if mode != "celt" \
        else OPUS_APPLICATION_AUDIO
    enc = ctypes.c_void_p(lib.opus_encoder_create(
        _SR, channels, app, ctypes.byref(err)))
    assert err.value == 0
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BITRATE),
                         ctypes.c_int32(bitrate))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_COMPLEXITY),
                         ctypes.c_int32(complexity))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_BANDWIDTH),
                         ctypes.c_int32(BW[bw]))
    lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_DTX),
                         ctypes.c_int32(dtx))
    force = {"silk": MODE_SILK_ONLY, "hybrid": MODE_HYBRID,
             "celt": MODE_CELT_ONLY}[mode]
    rc = lib.opus_encoder_ctl(enc, ctypes.c_int(OPUS_SET_FORCE_MODE),
                              ctypes.c_int32(force))
    print(f"force_mode rc={rc}")
    frame = int(_SR * frame_ms) // 1000
    pcm = np.asarray(pcm, np.float32).reshape(-1, channels)
    nfr = len(pcm) // frame
    out = ctypes.create_string_buffer(4000)
    pkts = []
    for i in range(nfr):
        fr = np.ascontiguousarray(pcm[i * frame:(i + 1) * frame])
        nb = lib.opus_encode_float(
            enc, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, out, len(out))
        assert nb > 0, nb
        pkts.append(out.raw[:nb])
    lib.opus_encoder_destroy(ctypes.c_void_p(enc.value))
    return pkts


def ref_decode(pkts, channels, rate=_SR):
    lib = load()
    err = ctypes.c_int(0)
    dec = ctypes.c_void_p(lib.opus_decoder_create(
        rate, channels, ctypes.byref(err)))
    assert err.value == 0
    buf = np.empty(5760 * channels, np.int16)
    outs = []
    for p in pkts:
        n = lib.opus_decode(
            dec, p, len(p),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            5760, 0)
        assert n > 0, n
        outs.append(buf[:n * channels].reshape(n, channels).copy())
    lib.opus_decoder_destroy(ctypes.c_void_p(dec.value))
    return outs


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "silk"
    channels = 2 if (len(sys.argv) > 2 and sys.argv[2] == "stereo") \
        else 1
    bw = sys.argv[3] if len(sys.argv) > 3 else "WB"
    frame_ms = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    bitrate = int(sys.argv[5]) if len(sys.argv) > 5 else 24000

    from audio_processor_tpu.io.opusdec.decoder import OpusDecoder
    from audio_processor_tpu.io.opusdec.packet import parse_packet

    pcm = speechy(_SR, channels)  # 1 s
    pkts = encode_packets(pcm, channels, mode, bw, bitrate, frame_ms)
    info0 = parse_packet(pkts[0])
    print(f"packets={len(pkts)} first: mode={info0.mode} "
          f"bw={info0.bandwidth} ms={info0.frame_ms} "
          f"stereo={info0.stereo} frames={len(info0.frames)}")

    if "--internal" in sys.argv:
        # Compare the pre-resampler 8/12/16 kHz signal instead: decode
        # with libopus at the SILK internal rate (passthrough resampler)
        rate = {"NB": 8000, "MB": 12000, "WB": 16000}[bw]
        refs = ref_decode(pkts, channels, rate)
        dec = OpusDecoder(channels)
        dec.silk.capture_xq = []
        for i, (p, ref) in enumerate(zip(pkts, refs)):
            assert channels == 1, "--internal only valid for mono " \
                "(stereo capture is pre-unmix mid/side)"
            dec.silk.capture_xq.clear()
            dec.decode_int16(p)
            mine = np.concatenate(
                [np.asarray(fr[0], np.int16)
                 for fr in dec.silk.capture_xq]).reshape(-1, 1)
            if mine.shape != ref.shape:
                print(f"pkt {i}: internal shape {mine.shape} vs "
                      f"{ref.shape}")
                return
            # libopus delay-compensates even the same-rate copy
            # resampler: search small shifts for an exact match
            hit = None
            m = mine[:, 0].astype(np.int32)
            r = ref[:, 0].astype(np.int32)
            for sh in range(0, 24):
                if i == 0:
                    ok = np.array_equal(m[:len(m) - sh] if sh else m,
                                        r[sh:])
                else:
                    ok = np.array_equal(m[:len(m) - sh] if sh else m,
                                        r[sh:]) if sh == 0 else False
                if ok:
                    hit = sh
                    break
            if hit is None and i > 0:
                # steady state: previous packet's tail feeds the delay
                for sh in range(1, 24):
                    if np.array_equal(m[:-sh], r[sh:]):
                        hit = sh
                        break
            if hit is not None:
                print(f"pkt {i}: internal exact (shift {hit})")
            else:
                d = np.abs(m - r)
                print(f"pkt {i}: internal {int((d > 0).sum())}"
                      f"/{d.size} differ max={d.max()} "
                      f"first={int(np.argwhere(d > 0)[0][0])}")
                if i >= 3:
                    return
        return

    refs = ref_decode(pkts, channels)
    dec = OpusDecoder(channels)
    n_exact = 0
    for i, (p, ref) in enumerate(zip(pkts, refs)):
        try:
            mine = dec.decode_int16(p)
        except Exception as e:
            print(f"pkt {i}: decode failed: {type(e).__name__}: {e}")
            raise
        if mine.shape != ref.shape:
            print(f"pkt {i}: shape {mine.shape} != ref {ref.shape}")
            return
        if np.array_equal(mine, ref):
            n_exact += 1
        else:
            diff = np.abs(mine.astype(np.int32) - ref.astype(np.int32))
            bad = int((diff > 0).sum())
            first = int(np.argwhere(diff > 0)[0][0])
            print(f"pkt {i}: {bad}/{diff.size} samples differ, "
                  f"max={diff.max()}, first at {first}")
            if i > 3 and n_exact == 0:
                return
    print(f"bit-exact packets: {n_exact}/{len(pkts)}")


if __name__ == "__main__":
    main()
