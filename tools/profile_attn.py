#!/usr/bin/env python
"""Profile the full-geometry Wav2Vec2Bert forward per attention impl
on the real TPU. Device-resident inputs (the tunnel's ~55 MB/s H2D
would otherwise dominate); execution forced via scalar host fetch
(block_until_ready is unreliable through the tunnel, see CLAUDE.md).

Usage: python tools/profile_attn.py [impl ...]   (default: all three)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.models import wav2vec2bert as w2v

B, L = 48, 1280        # 16 chunks x 3 views, 25 s bucket
AUDIO_SEC = 16 * 25.0  # audio represented by one batch


def main():
    impls = sys.argv[1:] or ["flash", "flash_rel", "xla"]
    print("devices:", jax.devices(), flush=True)
    cfg = w2v.W2VBertConfig(vocab_size=64)
    params = w2v.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    feats = jax.device_put(
        rng.standard_normal((B, L, 160)).astype(np.float32))
    mask = jax.device_put(np.ones((B, L), bool))
    float(jnp.sum(feats))  # force uploads now

    for impl in impls:
        def run(p, f, m, impl=impl):
            logits = w2v.forward(p, cfg, f, m, dtype=jnp.bfloat16,
                                 attention_impl=impl)
            return jnp.sum(logits)

        fn = jax.jit(run)
        t0 = time.perf_counter()
        try:
            s = float(fn(params, feats, mask))
        except Exception as e:
            print(f"{impl}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"{impl}: compile+first {time.perf_counter()-t0:.1f}s "
              f"(sum={s:.3e})", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(params, feats, mask))
            best = min(best, time.perf_counter() - t0)
        print(f"{impl}: best {best*1e3:.1f} ms/batch -> "
              f"RTFx {AUDIO_SEC/best:.0f} (encoder only)", flush=True)


if __name__ == "__main__":
    main()
