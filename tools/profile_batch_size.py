#!/usr/bin/env python
"""Device-resident encoder throughput vs batch rows (25 s bucket).

Is there MXU efficiency left above the production 48-row batch
(16 chunks x 3 views)? Times the full-geometry forward at several row
counts with inputs pre-staged in HBM and a data-dependent loop, the
only timing stable under the tunnel (CLAUDE.md).

Usage: python tools/profile_batch_size.py [rows ...]  (default 48 84 96)
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

L = 1280  # 25 s bucket, fbank frames


def main():
    rows_list = [int(x) for x in sys.argv[1:]] or [48, 84, 96]
    print("devices:", jax.devices(), flush=True)
    from audio_processor_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    cfg = w2v.W2VBertConfig(vocab_size=64)
    params = w2v.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    rng = np.random.default_rng(0)

    for B in rows_list:
        feats = jax.device_put(rng.standard_normal(
            (B, L, cfg.feature_projection_input_dim)).astype(np.float32))
        mask = jax.device_put(np.ones((B, L), bool))

        @jax.jit
        def loop(p, f, m, n):
            def body(_, acc):
                out = w2v.forward(p, cfg, f + acc * 1e-9, m,
                                  dtype=jnp.bfloat16,
                                  attention_impl="flash_rel")
                return jnp.sum(out) * 1e-20
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        t0 = time.perf_counter()
        float(loop(params, feats, mask, 1))
        print(f"B={B:3d}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        n_iters = 5
        t0 = time.perf_counter()
        float(loop(params, feats, mask, n_iters))
        dt = (time.perf_counter() - t0) / n_iters
        audio_sec = (B / 3) * 25.0
        print(f"B={B:3d}: {dt*1e3:7.1f} ms/fwd  "
              f"{dt/B*1e3:6.2f} ms/row  RTFx {audio_sec/dt:6.0f}",
              flush=True)


if __name__ == "__main__":
    main()
