"""Shared W8A8 int8 inference primitives.

Symmetric per-output-channel weight quantization (static, done once at
load) x per-token dynamic activation quantization (inside the jitted
program). The v5e MXU is capable of running int8 x int8 -> int32 at 2x
its bf16 rate (394 TOPS vs 197 TFLOP/s), but on this image's
XLA/libtpu the lowering reaches only ~1.1x (81 vs 74 TF/s measured,
ARCHITECTURE.md "int8 W8A8 inference"), so the realized full-forward
win is ~8%; the mode still halves weight memory and doubles on
toolchains whose int8 path hits the native rate. Used by the Wav2Vec2Bert
encoder and the BERT sentiment classifiers when the pipeline config
sets ``quantization: int8`` (opt-in; the default bf16/fp32 path keeps
the bit-match parity contract).

The reference's analog is fp16 autocast on CUDA
(services/audio_processor.py:227-231) — reduced-precision inference
as a speed mode; int8 is the TPU-native version of that trade.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_kernel(kernel: jnp.ndarray):
    """[..., d_in, d_out] fp kernel -> (int8 kernel, [..., d_out]
    fp32 per-out-channel scales). Leading axes (a stacked-layer axis)
    keep their own scales."""
    k = jnp.asarray(kernel, jnp.float32)
    scale = jnp.max(jnp.abs(k), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    kq = jnp.round(k / scale).astype(jnp.int8)
    return kq, jnp.squeeze(scale, axis=-2)


def quantize_dense(d: Params) -> Params:
    """{'kernel', 'bias'?} -> {'kernel_q', 'scale', 'bias'?}."""
    kq, scale = quantize_kernel(d["kernel"])
    nd = {"kernel_q": kq, "scale": scale}
    if "bias" in d:
        nd["bias"] = d["bias"]
    return nd


def dense_int8(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 dense with per-token dynamic activation scales."""
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.round(x32 / sx).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["kernel_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * p["scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def copy_tree(t):
    """Copy dict structure, share array leaves."""
    return ({k: copy_tree(v) for k, v in t.items()}
            if isinstance(t, dict) else t)
