#!/usr/bin/env python
"""Isolate the attention primitive at production geometry on the real
chip: flash_rel (ours) vs stock pallas flash without bias (flash
formulation lower bound) vs raw qk+av dots (MXU speed of light).
Bounds how much headroom the flash_rel kernel still has.

Usage: python tools/profile_attn_micro.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, L, D = 48, 16, 1280, 64
NUM_BUCKETS, LEFT = 73, 64
LAYERS = 24  # scale per-call numbers to a full-forward estimate


def bench(name, fn, args, reps=5):
    t0 = time.perf_counter()
    try:
        s = float(jnp.sum(fn(*args)))
    except Exception as e:
        print(f"{name:28s}: FAILED {type(e).__name__}: {e}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s}: {best*1e3:7.2f} ms/call  x{LAYERS} layers = "
          f"{best*1e3*LAYERS:7.1f} ms  (compile {compile_s:.1f}s, "
          f"sum={s:.3e})", flush=True)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def dev(shape, dtype=jnp.bfloat16):
        return jax.device_put(jnp.asarray(
            rng.standard_normal(shape) * 0.05, dtype))

    q = dev((B, H, L, D))
    k = dev((B, H, L, D))
    v = dev((B, H, L, D))
    srel = dev((B, H, L, 128))
    kv_mask = jax.device_put(jnp.ones((B, L), jnp.float32))
    float(jnp.sum(q) + jnp.sum(k) + jnp.sum(v) + jnp.sum(srel))

    scale = 1.0 / np.sqrt(D)

    from audio_processor_tpu.models.flash_rel_attention import (
        flash_rel_attention,
    )

    E = dev((NUM_BUCKETS, D))
    bench("flash_rel (ours)", jax.jit(
        lambda q, k, v, s, m: flash_rel_attention(
            q, k, v, E, m, scale, LEFT, NUM_BUCKETS)),
        (q, k, v, srel, kv_mask), reps)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    for bq, bkv in ((1280, 1280), (640, 1280), (1280, 256), (512, 512)):
        try:
            bs = BlockSizes(
                block_q=bq, block_k_major=bkv, block_k=min(bkv, 512),
                block_b=1)
            bench(f"stock flash nobias {bq}x{bkv}", jax.jit(
                lambda q, k, v, bs=bs: flash_attention(
                    q, k, v, sm_scale=float(scale), block_sizes=bs)),
                (q, k, v), reps)
        except Exception as e:
            print(f"stock flash {bq}x{bkv}: {type(e).__name__}: {e}",
                  flush=True)

    # Raw matmul SOL: qk + av as plain dots (no softmax, no streaming).
    def raw(q, k, v):
        s = jnp.einsum("bhld,bhmd->bhlm", q, k,
                       preferred_element_type=jnp.float32)
        p = (s * scale).astype(jnp.bfloat16)
        return jnp.einsum("bhlm,bhmd->bhld", p, v,
                          preferred_element_type=jnp.float32)

    bench("raw qk+av dots (SOL)", jax.jit(raw), (q, k, v), reps)

    # Raw dots + softmax: adds the exp/max/sum VPU cost via XLA.
    def raw_sm(q, k, v):
        s = jnp.einsum("bhld,bhmd->bhlm", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhlm,bhmd->bhld", p, v,
                          preferred_element_type=jnp.float32)

    bench("raw dots + softmax", jax.jit(raw_sm), (q, k, v), reps)


if __name__ == "__main__":
    main()
