#!/usr/bin/env python
"""Conv-module cost breakdown at production geometry (B=48, L=1280)
on the real chip, plus alternative depthwise formulations. Records the
round-2 negative results so future rounds don't re-explore them:

- pointwise+GLU runs at ~matmul peak (no headroom).
- depthwise conv_general ~2.2 ms/layer (~7x its HBM bound) but an
  unrolled 31-tap shift-mult-add is 3.5x WORSE (XLA materializes each
  shifted slice as a relayout).
- a fused pallas conv-module kernel models out to ~5.1 vs 5.75
  ms/layer (matmuls 2.8 + in-VMEM taps ~1.5 + LN ~0.5): the
  accumulator spills (1280 vregs) make the tap loop VMEM-bound, so
  the fusion upside is ~2%, not worth the correctness risk.
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

B, L = 48, 1280


def main():
    from audio_processor_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    cfg = w2v.W2VBertConfig(vocab_size=64)
    params = jax.device_put(w2v.init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    x0 = jax.device_put(rng.standard_normal(
        (B, L, cfg.hidden_size)).astype(jnp.bfloat16))
    pad_mask = jnp.ones((B, L), jnp.float32)
    eps = cfg.layer_norm_eps
    K = cfg.conv_depthwise_kernel_size

    def scan24(body):
        @jax.jit
        def run(p, x):
            def f(h, lp):
                return body(lp, h), None
            y, _ = jax.lax.scan(f, x, p["layers"])
            return jnp.sum(y.astype(jnp.float32))
        return run

    def timeit(fn, *args, n=4):
        float(fn(*args))
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def pw_only(lp, h):
        p = lp["conv_module"]
        h = w2v.dense(p["pointwise_conv1"], h)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(g)
        return w2v.dense(p["pointwise_conv2"], h)

    def dw_conv(lp, h):
        p = lp["conv_module"]
        hp = jnp.pad(h, ((0, 0), (K - 1, 0), (0, 0)))
        kernel = p["depthwise_conv"]["kernel"].astype(h.dtype)
        return jax.lax.conv_general_dilated(
            hp, kernel[:, None, :], window_strides=(1,),
            padding=((0, 0),), dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=cfg.hidden_size)

    def dw_taps(lp, h):
        p = lp["conv_module"]
        kernel = p["depthwise_conv"]["kernel"].astype(jnp.float32)
        hp = jnp.pad(h, ((0, 0), (K - 1, 0), (0, 0)))
        acc = jnp.zeros(h.shape, jnp.float32)
        for k in range(K):
            acc = acc + (hp[:, k:k + h.shape[1], :].astype(jnp.float32)
                         * kernel[k][None, None, :])
        return acc.astype(h.dtype)

    def ln_only(lp, h):
        p = lp["conv_module"]
        h = w2v.layer_norm(p["layer_norm"], h, eps)
        return w2v.layer_norm(p["depthwise_layer_norm"], h, eps)

    def full_conv(lp, h):
        return w2v.conv_module(lp["conv_module"], cfg, h, pad_mask)

    for name, body in (("pointwise+glu", pw_only),
                       ("depthwise conv_general", dw_conv),
                       ("depthwise 31-tap unroll", dw_taps),
                       ("2x layernorm", ln_only),
                       ("full conv module", full_conv)):
        t = timeit(scan24(body), params, x0)
        print(f"{name:24s}: {t*1e3:6.1f} ms /24L", flush=True)


if __name__ == "__main__":
    main()
