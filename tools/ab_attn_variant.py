#!/usr/bin/env python
"""Interleaved in-process A/B of flash_rel_attention variants on the
real chip, device-resident and loop-amortized (the only timing regime
stable under the tunneled transport — CLAUDE.md).

Each timed sample is ONE device execution of a fori_loop chaining N
kernel calls (output feeds back as q, a real data dependency), so
dispatch/transfer overheads amortize away. Variants alternate within
the same process: A/B/A/B... x rounds.

Usage: python tools/ab_attn_variant.py [N_inner] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.models.flash_rel_attention import (
    flash_rel_attention,
)

B, H, L, D = 48, 16, 1280, 64
NUM_BUCKETS, LEFT = 73, 64
LAYERS = 24


def main():
    n_inner = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def dev(shape, dtype=jnp.bfloat16):
        return jax.device_put(jnp.asarray(
            rng.standard_normal(shape) * 0.05, dtype))

    q = dev((B, H, L, D))
    k = dev((B, H, L, D))
    v = dev((B, H, L, D))
    E = dev((NUM_BUCKETS, D))
    kv_mask = jax.device_put(jnp.ones((B, L), jnp.float32))
    float(jnp.sum(q) + jnp.sum(k) + jnp.sum(v) + jnp.sum(E))
    scale = 1.0 / np.sqrt(D)

    def looped(variant):
        def body(i, x):
            return flash_rel_attention(
                x, k, v, E, kv_mask, scale, LEFT, NUM_BUCKETS,
                variant=variant)
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, n_inner, body, x))

    import audio_processor_tpu.models.flash_rel_attention as fra

    def looped_qb(qb):
        def body(i, x):
            real = fra._onepass_q_tile
            fra._onepass_q_tile = lambda L: qb
            try:
                return flash_rel_attention(
                    x, k, v, E, kv_mask, scale, LEFT, NUM_BUCKETS,
                    variant="onepass")
            finally:
                fra._onepass_q_tile = real
        return jax.jit(lambda x: jax.lax.fori_loop(0, n_inner, body, x))

    names = ["stream", "onepass"] + [f"onepass_qb{qb}"
                                     for qb in (320, 1280)]
    fns = {}
    for name in names:
        t0 = time.perf_counter()
        fn = (looped(name) if name in ("stream", "onepass")
              else looped_qb(int(name.split("qb")[1])))
        try:
            s = float(jnp.sum(fn(q)))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"{name}: compiled+first in "
              f"{time.perf_counter() - t0:.1f}s sum={s:.3e}", flush=True)
        fns[name] = fn

    results = {name: [] for name in fns}
    for r in range(rounds):
        for variant in fns:
            t0 = time.perf_counter()
            float(jnp.sum(fns[variant](q)))
            dt = time.perf_counter() - t0
            ms = dt / n_inner * 1e3
            results[variant].append(ms)
            print(f"round {r} {variant:8s}: {ms:7.2f} ms/call "
                  f"x{LAYERS} = {ms*LAYERS:7.1f} ms/fwd", flush=True)

    for variant, ms in results.items():
        best, med = min(ms), sorted(ms)[len(ms) // 2]
        print(f"{variant:8s}: best {best:.2f} med {med:.2f} ms/call "
              f"({best*LAYERS:.1f} / {med*LAYERS:.1f} ms per 24-layer "
              f"fwd)", flush=True)


if __name__ == "__main__":
    main()
