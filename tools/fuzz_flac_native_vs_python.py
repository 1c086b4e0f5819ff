"""Differential fuzz: native C++ FLAC decoder vs the Python reference.

Two arms:
- valid arm: random spec-valid streams from tests/flac_encoder.py
  (random bps / channels / block size / stereo mode / subframe plan /
  partition order / escapes / wasted bits) must decode BIT-IDENTICAL
  through native/flac.cpp and io/flac.py.
- corruption arm: random byte flips / bursts / truncations of those
  streams. Safety property: the native path must never serve data the
  Python reference rejects, and when both accept, outputs must still
  be bit-identical. (Native rejecting where Python accepts is fine —
  production falls back to the Python decoder on any native failure,
  decode.py.)

Usage: python tools/fuzz_flac_native_vs_python.py [n_trials] [seed]
"""

import os
import random
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from audio_processor_tpu.io import native  # noqa: E402
from audio_processor_tpu.io.flac import FlacError, decode_flac  # noqa: E402
from tests.flac_encoder import encode_flac  # noqa: E402


def make_stream(rnd: random.Random) -> bytes:
    bps = rnd.choice([8, 16, 16, 16, 24])
    ch = rnd.choice([1, 2, 2])
    n = rnd.randrange(600, 6000)
    block = rnd.choice([192, 256, 512, 576, 700, 1024, 4096])
    mode = "independent" if ch == 1 else rnd.choice(
        ["independent", "left_side", "right_side", "mid_side"])
    plan = rnd.choice([
        "verbatim", ("fixed", rnd.randrange(5)),
        ("lpc", rnd.choice([1, 2, 4, 8, 12, 32]),
         rnd.randrange(8, 15))])
    order = plan[1] if isinstance(plan, tuple) else 0
    # partitions must divide the block; the first must keep a
    # positive sample count after the warmup
    po = rnd.choice([p for p in (0, 0, 1, 2, 3)
                     if block % (1 << p) == 0
                     and (block >> p) > order])
    wasted = rnd.choice([0, 0, 0, 1, 3]) if mode == "independent" else 0
    rice2 = rnd.random() < 0.3
    escapes = tuple(i for i in range(1 << po) if rnd.random() < 0.2)

    rng = np.random.default_rng(rnd.randrange(1 << 30))
    amp = (1 << (bps - 1)) - 1
    t = np.arange(n)
    x = np.stack([np.clip(np.round(amp * (
        0.6 * np.sin(2 * np.pi * (0.001 + 0.003 * rng.random()) * t)
        + 0.1 * rng.standard_normal(n))), -amp - 1, amp)
        for _ in range(ch)], 1).astype(np.int64)
    if wasted:
        x &= ~np.int64((1 << wasted) - 1)
    rate = rnd.choice([8000, 16000, 44100, 11025])
    return encode_flac(x, rate, bps, block_size=block, ch_mode=mode,
                       plan=plan, part_order=po, escape_parts=escapes,
                       rice2=rice2, wasted=wasted,
                       extra_metadata=rnd.random() < 0.3)


def corrupt(rnd: random.Random, data: bytes) -> bytes:
    b = bytearray(data)
    mode = rnd.randrange(3)
    if mode == 0:
        b[rnd.randrange(len(b))] ^= rnd.randrange(1, 256)
    elif mode == 1:
        off = rnd.randrange(len(b))
        for k in range(off, min(off + rnd.randrange(1, 48), len(b))):
            b[k] = rnd.randrange(256)
    else:
        b = b[:rnd.randrange(4, len(b))]
    return bytes(b)


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if not (native.available() and native.has_flac()):
        print("native flac decoder not built; run native/build.sh")
        return 1
    rnd = random.Random(seed)
    fails = 0
    with tempfile.NamedTemporaryFile(suffix=".flac",
                                     delete=False) as f:
        path = f.name
    try:
        for trial in range(n_trials):
            data = make_stream(rnd)
            if trial % 2:
                data = corrupt(rnd, data)
                must_match = False
            else:
                must_match = True
            with open(path, "wb") as f:
                f.write(data)
            nat = native.decode_flac(path)
            try:
                py = decode_flac(data)
            except FlacError:
                py = None
            ok = True
            if must_match:
                ok = (nat is not None and py is not None
                      and nat[1] == py[1]
                      and np.array_equal(nat[0], py[0]))
                why = "valid stream mismatch/reject"
            else:
                if py is None:
                    ok = nat is None       # python rejects -> native must
                    why = "native accepted what python rejects"
                elif nat is not None:
                    ok = nat[1] == py[1] and np.array_equal(nat[0],
                                                            py[0])
                    why = "both accepted but outputs differ"
                # nat None while py accepts: fine (fallback covers it)
            if not ok:
                fails += 1
                crash = f"/tmp/flac_diff_fail_{seed}_{trial}.flac"
                with open(crash, "wb") as f:
                    f.write(data)
                print(f"FAIL trial {trial}: {why} -> {crash}")
                if fails >= 5:
                    break
            if (trial + 1) % 50 == 0:
                print(f"{trial + 1}/{n_trials} ok={trial + 1 - fails}")
    finally:
        os.unlink(path)
    print(f"{n_trials} trials, {fails} failures (seed {seed})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
