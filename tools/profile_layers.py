#!/usr/bin/env python
"""Per-component device-time breakdown of the production-geometry
encoder forward (B=48, L=1280, 24 layers): times 24-layer scans built
from each conformer sub-block in isolation, plus the full forward.
Device-resident inputs; execution forced by scalar fetch."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.models import wav2vec2bert as w2v

B, L = 48, 1280


def timeit(fn, *args, n=4):
    float(jnp.sum(fn(*args)))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from audio_processor_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    cfg = w2v.W2VBertConfig(vocab_size=64)
    params = jax.device_put(w2v.init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    x0 = jax.device_put(rng.standard_normal(
        (B, L, cfg.hidden_size)).astype(jnp.bfloat16))
    feats = jax.device_put(rng.standard_normal(
        (B, L, 160)).astype(np.float32))
    mask = jax.device_put(np.ones((B, L), np.bool_))
    pad_mask = jnp.ones((B, L), jnp.float32)
    attn_bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    eps = cfg.layer_norm_eps

    def scan24(body):
        @jax.jit
        def run(p, x):
            def f(h, lp):
                return body(lp, h), None
            y, _ = jax.lax.scan(f, x, p["layers"])
            return jnp.sum(y.astype(jnp.float32))
        return run

    def ffn_body(lp, h):
        r = h
        h = w2v.layer_norm(lp["ffn1_layer_norm"], h, eps)
        h = w2v.feed_forward(lp["ffn1"], h) * 0.5 + r
        r = h
        h = w2v.layer_norm(lp["ffn2_layer_norm"], h, eps)
        return w2v.feed_forward(lp["ffn2"], h) * 0.5 + r

    def attn_body(impl):
        def body(lp, h):
            r = h
            h = w2v.layer_norm(lp["self_attn_layer_norm"], h, eps)
            return w2v.self_attention(lp["self_attn"], cfg, h,
                                      attn_bias, impl=impl) + r
        return body

    def conv_body(lp, h):
        return w2v.conv_module(lp["conv_module"], cfg, h, pad_mask) + h

    def ln_body(lp, h):
        return w2v.layer_norm(lp["final_layer_norm"], h, eps)

    parts = [
        ("ffn x2 (24L)", scan24(ffn_body)),
        ("attention flash_rel (24L)", scan24(attn_body("flash_rel"))),
        ("conv module (24L)", scan24(conv_body)),
        ("final LN (24L)", scan24(ln_body)),
    ]
    total = 0.0
    for name, fn in parts:
        dt = timeit(fn, params, x0)
        total += dt
        print(f"{name:28s}: {dt*1e3:7.1f} ms", flush=True)
    print(f"{'sum of parts':28s}: {total*1e3:7.1f} ms", flush=True)

    @jax.jit
    def full(p, f, m):
        return jnp.sum(w2v.forward(p, cfg, f, m, dtype=jnp.bfloat16,
                                   attention_impl="flash_rel"))

    dt = timeit(full, params, feats, mask)
    print(f"{'full forward (w/ fbank-proj)':28s}: {dt*1e3:7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
