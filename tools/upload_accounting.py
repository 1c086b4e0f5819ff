#!/usr/bin/env python
"""H2D upload byte accounting for the candidate device-program
layouts, on the bench workload (24 x 180 s stereo calls, 25 s chunks,
1 s overlap, int16 wire). Pure host math — no TPU needed.

This closes ARCHITECTURE.md roadmap #1 ("per-call fused device
program") with numbers: once the fused per-chunk path uploads int16
agent/client rows (round 2), the remaining chunk-overlap duplication
is smaller than the padding a per-call super-chunk bucket
reintroduces, so the per-call program is NOT an upload win at the
3-minute call geometry. See the printed table.

  per-chunk fused (current): sum over chunks of
      2 ch * (bucket_len + 2*PAD) * 2 B    [tail chunks take the
      smallest covering bucket; sub-batch padding rows excluded
      because _tail_size shrinks them to the power-of-2 fit]
  per-call bucketed (hypothetical): 2 ch * L_super * 2 B with
      L_super = (ceil((call-chunk)/stride)+1 chunks... snapped to a
      {1,2,4,8,...}-chunk bucket) * stride + overlap
  raw floor: 2 ch * call_samples * 2 B
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from audio_processor_tpu.dsp.acoustic_features import PAD
from audio_processor_tpu.pipeline.chunker import (
    chunk_boundaries, pick_bucket,
)

SR = 16000
CALL_SEC = 180.0
N_CALLS = 24
CHUNK = int(25.0 * SR)
STRIDE = CHUNK - int(1.0 * SR)
BUCKETS = tuple(int(b * SR) for b in (5.0, 10.0, 15.0, 20.0, 25.0))


def per_chunk_bytes(call_samples: int) -> int:
    total = 0
    for s, e in chunk_boundaries(call_samples, CHUNK, STRIDE):
        bucket = pick_bucket(e - s, BUCKETS)
        total += 2 * (bucket + 2 * PAD) * 2
    return total


def per_call_bytes(call_samples: int) -> int:
    bounds = chunk_boundaries(call_samples, CHUNK, STRIDE)
    n = len(bounds)
    n_bucket = 1
    while n_bucket < n:
        n_bucket *= 2
    l_super = (n_bucket - 1) * STRIDE + CHUNK
    return 2 * l_super * 2


def main():
    call = int(CALL_SEC * SR)
    raw = 2 * call * 2
    pc = per_chunk_bytes(call)
    pcall = per_call_bytes(call)
    print(f"workload: {N_CALLS} x {CALL_SEC:.0f}s stereo calls, "
          f"int16 wire, chunk 25s / stride 24s")
    print(f"  raw floor          : {N_CALLS*raw/1e6:8.1f} MB "
          f"({raw/1e6:.2f} MB/call)")
    print(f"  per-chunk fused    : {N_CALLS*pc/1e6:8.1f} MB "
          f"({pc/1e6:.2f} MB/call, +{100*(pc/raw-1):.1f}% vs floor)")
    print(f"  per-call bucketed  : {N_CALLS*pcall/1e6:8.1f} MB "
          f"({pcall/1e6:.2f} MB/call, +{100*(pcall/raw-1):.1f}% vs floor)")
    print(f"\nper-call minus per-chunk: {(pcall-pc)/1e6:+.2f} MB/call "
          f"-> {'WORSE' if pcall > pc else 'better'} at this geometry")
    print("at ~55 MB/s tunnel H2D, the delta is "
          f"{abs(pcall-pc)*N_CALLS/55e6:.2f} s per 24-call sweep")


if __name__ == "__main__":
    main()
