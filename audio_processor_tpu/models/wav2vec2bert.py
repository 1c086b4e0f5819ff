"""Wav2Vec2Bert CTC model in pure functional JAX.

Architecture-compatible with HF ``Wav2Vec2BertForCTC`` (the reference's
ASR model, services/audio_processor.py:54-59): feature projection over
160-dim stacked fbank features, a stack of conformer blocks (ffn1·0.5 →
self-attention with relative-key position embeddings → causal
depthwise-conv module → ffn2·0.5 → final LN), and a CTC head. Weights
convert 1:1 from HF checkpoints (models/convert_hf.py).

TPU-first design decisions (not a port of the torch code):

- Layers are *stacked* (leading layer axis on every weight) and the
  encoder runs as one ``lax.scan`` over layers — a single compiled
  block body instead of 24 unrolled layers; optional ``jax.checkpoint``
  for training rematerialization.
- relative_key attention: HF materializes a [L, L, head_dim]
  position-embedding tensor per layer. Distances are clipped to
  [-left, right] so there are only ``left+right+1`` distinct rows; we
  compute q·E once ([B, H, L, P], a matmul) and gather with a static
  [L, L] index map — O(L²) memory like the score matrix itself, and
  MXU-friendly.
- Params stay fp32; compute dtype (bf16 on TPU) is a function
  argument. Logits are always returned in fp32 so greedy CTC argmax is
  stable (bit-match requirement, BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class W2VBertConfig:
    vocab_size: int = 64
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    feature_projection_input_dim: int = 160
    conv_depthwise_kernel_size: int = 31
    left_max_position_embeddings: int = 64
    right_max_position_embeddings: int = 8
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 0            # CTC blank

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_positions(self) -> int:
        return (self.left_max_position_embeddings
                + self.right_max_position_embeddings + 1)

    @classmethod
    def from_hf(cls, hf_config) -> "W2VBertConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            feature_projection_input_dim=hf_config.feature_projection_input_dim,
            conv_depthwise_kernel_size=hf_config.conv_depthwise_kernel_size,
            left_max_position_embeddings=hf_config.left_max_position_embeddings,
            right_max_position_embeddings=hf_config.right_max_position_embeddings,
            layer_norm_eps=hf_config.layer_norm_eps,
            pad_token_id=hf_config.pad_token_id or 0,
        )


# ----------------------------------------------------------------------
# Parameter initialization
# ----------------------------------------------------------------------

def _dense(rng, d_in, d_out, std=0.02):
    return {"kernel": jax.random.normal(rng, (d_in, d_out),
                                        jnp.float32) * std,
            "bias": jnp.zeros((d_out,), jnp.float32)}


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_layer_params(rng, cfg: W2VBertConfig) -> Params:
    h, i = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(rng, 12)
    return {
        "ffn1_layer_norm": _ln(h),
        "ffn1": {"intermediate_dense": _dense(ks[0], h, i),
                 "output_dense": _dense(ks[1], i, h)},
        "self_attn_layer_norm": _ln(h),
        "self_attn": {
            "linear_q": _dense(ks[2], h, h),
            "linear_k": _dense(ks[3], h, h),
            "linear_v": _dense(ks[4], h, h),
            "linear_out": _dense(ks[5], h, h),
            "distance_embedding": jax.random.normal(
                ks[6], (cfg.num_positions, cfg.head_size),
                jnp.float32) * 0.02,
        },
        "conv_module": {
            "layer_norm": _ln(h),
            "pointwise_conv1": {"kernel": jax.random.normal(
                ks[7], (h, 2 * h), jnp.float32) * 0.02},
            "depthwise_conv": {"kernel": jax.random.normal(
                ks[8], (cfg.conv_depthwise_kernel_size, h),
                jnp.float32) * 0.02},
            "depthwise_layer_norm": _ln(h),
            "pointwise_conv2": {"kernel": jax.random.normal(
                ks[9], (h, h), jnp.float32) * 0.02},
        },
        "ffn2_layer_norm": _ln(h),
        "ffn2": {"intermediate_dense": _dense(ks[10], h, i),
                 "output_dense": _dense(ks[11], i, h)},
        "final_layer_norm": _ln(h),
    }


def init_params(rng, cfg: W2VBertConfig) -> Params:
    k_proj, k_layers, k_head = jax.random.split(rng, 3)
    layer_rngs = jax.random.split(k_layers, cfg.num_hidden_layers)
    per_layer = [init_layer_params(r, cfg) for r in layer_rngs]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    return {
        "feature_projection": {
            "layer_norm": _ln(cfg.feature_projection_input_dim),
            "projection": _dense(k_proj, cfg.feature_projection_input_dim,
                                 cfg.hidden_size),
        },
        "layers": stacked,
        "lm_head": _dense(k_head, cfg.hidden_size, cfg.vocab_size),
    }


# ----------------------------------------------------------------------
# Forward pass
# ----------------------------------------------------------------------

def layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in p:
        return _dense_int8(p, x)
    y = jnp.matmul(x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


from audio_processor_tpu.models.quant import (  # noqa: E402
    copy_tree as _copy_tree,
    dense_int8 as _dense_int8,
    quantize_dense as _quantize_dense,
    quantize_kernel as _quantize_kernel,
)


def quantize_params(params: Params) -> Params:
    """Return a copy of the param tree with the hot dense kernels
    replaced by int8 weights + per-channel scales (picked up by
    ``dense``). Quantized: ffn1/ffn2, attention q/k/v/out, conv
    pointwise 1/2. Kept in fp32: feature projection and lm_head
    (entry/exit numerics), LayerNorms, depthwise conv (VPU-bound),
    distance embeddings. Params stay fp32 elsewhere; activation
    quantization is dynamic per token inside ``dense``.
    """
    out = _copy_tree(params)
    L = out["layers"]
    q = _quantize_dense
    for ffn in ("ffn1", "ffn2"):
        for part in ("intermediate_dense", "output_dense"):
            L[ffn][part] = q(L[ffn][part])
    for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
        L["self_attn"][proj] = q(L["self_attn"][proj])
    for pw in ("pointwise_conv1", "pointwise_conv2"):
        L["conv_module"][pw] = q(L["conv_module"][pw])
    return out


def swish(x):
    return x * jax.nn.sigmoid(x)


def feed_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return dense(p["output_dense"], swish(dense(p["intermediate_dense"], x)))


@functools.lru_cache(maxsize=32)
def _distance_index(seq_len: int, left: int, right: int) -> np.ndarray:
    """Static [L, L] map: (query i, key j) -> clipped-distance bucket."""
    i = np.arange(seq_len)[:, None]
    j = np.arange(seq_len)[None, :]
    return np.clip(j - i, -left, right) + left


def _relative_bias(p: Params, cfg: W2VBertConfig, q: jnp.ndarray,
                   L: int, out_dtype) -> jnp.ndarray:
    """Unscaled relative_key bias: rel[b,h,l,m] = q·E[clip(m-l)].

    The distance table has only P = left+right+1 distinct rows; expand
    it with a *static* index map into [L, L, hd] and contract on the
    MXU. (A dynamic take_along_axis gather over the [B,H,L,L] score
    grid compiles to a catastrophic scalar gather on TPU — measured
    400x slower.)
    """
    idx = jnp.asarray(_distance_index(
        L, cfg.left_max_position_embeddings,
        cfg.right_max_position_embeddings))                # [L, L] static
    pe = p["distance_embedding"].astype(q.dtype)[idx]      # [L, L, hd]
    return jnp.einsum("bhld,lmd->bhlm", q, pe,
                      preferred_element_type=out_dtype)


def self_attention(p: Params, cfg: W2VBertConfig, x: jnp.ndarray,
                   attn_bias: jnp.ndarray,
                   impl: str = "xla") -> jnp.ndarray:
    B, L, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_size
    q = dense(p["linear_q"], x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    k = dense(p["linear_k"], x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    v = dense(p["linear_v"], x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    scale = 1.0 / np.sqrt(hd)

    if impl == "flash_rel" and L % 256 == 0:
        # Custom Pallas kernel: the relative-key bias is expanded
        # INSIDE the kernel from [B,H,L,P] bucket logits, so no
        # [B,H,L,L] bias tensor ever exists in HBM
        # (models/flash_rel_attention.py).
        from audio_processor_tpu.models.flash_rel_attention import (
            flash_rel_attention,
        )

        P = cfg.num_positions
        E = p["distance_embedding"].astype(x.dtype)        # [P, hd]
        # The bucket logits q·E are computed INSIDE the kernel (fp32
        # accumulation — the rel logits add to fp32-accumulated qk
        # scores; rounding them to bf16 costs ~5% greedy-id flips vs
        # the xla path), so no [B, H, L, P] tensor exists in HBM.
        kv_mask = (attn_bias[:, 0, 0, :] >= 0).astype(jnp.float32)
        out = flash_rel_attention(
            q, k, v, E, kv_mask, float(scale),
            cfg.left_max_position_embeddings, P).astype(x.dtype)
    elif impl == "flash" and L % 128 == 0:
        # Pallas TPU flash attention: the [B,H,L,L] score/prob tensors
        # never round-trip HBM (the XLA path spends ~half the whole
        # forward in that traffic). Kernel computes
        # softmax((qk + ab) * sm_scale) @ v; fold the additive mask
        # (already scaled like HF's) into ab by dividing by sm_scale.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention,
        )

        ab = (_relative_bias(p, cfg, q, L, jnp.bfloat16)
              + (attn_bias / scale).astype(jnp.bfloat16))
        ab = jnp.broadcast_to(ab, (B, nh, L, L))
        bs = BlockSizes(block_q=min(512, L), block_k_major=128,
                        block_k=128, block_b=1)
        out = flash_attention(q, k, v, ab=ab, sm_scale=float(scale),
                              block_sizes=bs)
        out = out.astype(x.dtype)
    else:
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k,
                            preferred_element_type=jnp.float32) * scale
        rel = _relative_bias(p, cfg, q, L, jnp.float32) * scale
        scores = scores + rel + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, H)
    return dense(p["linear_out"], out)


def conv_module(p: Params, cfg: W2VBertConfig, x: jnp.ndarray,
                pad_mask: jnp.ndarray) -> jnp.ndarray:
    """Conformer convolution block with causal (left-only) padding."""
    x = layer_norm(p["layer_norm"], x, cfg.layer_norm_eps)
    x = x * pad_mask[..., None].astype(x.dtype)

    x = dense(p["pointwise_conv1"], x)
    a, g = jnp.split(x, 2, axis=-1)
    x = a * jax.nn.sigmoid(g)                                   # GLU

    k = cfg.conv_depthwise_kernel_size
    x = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))                # causal
    # Depthwise conv as NHC with feature groups == channels.
    kernel = p["depthwise_conv"]["kernel"].astype(x.dtype)      # [K, H]
    x = jax.lax.conv_general_dilated(
        x, kernel[:, None, :],
        window_strides=(1,), padding=((0, 0),),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.hidden_size)

    x = layer_norm(p["depthwise_layer_norm"], x, cfg.layer_norm_eps)
    x = swish(x)
    return dense(p["pointwise_conv2"], x)


def encoder_layer(p: Params, cfg: W2VBertConfig, x: jnp.ndarray,
                  attn_bias: jnp.ndarray, pad_mask: jnp.ndarray,
                  attention_impl: str = "xla") -> jnp.ndarray:
    res = x
    x = layer_norm(p["ffn1_layer_norm"], x, cfg.layer_norm_eps)
    x = feed_forward(p["ffn1"], x) * 0.5 + res

    res = x
    h = layer_norm(p["self_attn_layer_norm"], x, cfg.layer_norm_eps)
    x = self_attention(p["self_attn"], cfg, h, attn_bias,
                       impl=attention_impl) + res

    x = conv_module(p["conv_module"], cfg, x, pad_mask) + x

    res = x
    x = layer_norm(p["ffn2_layer_norm"], x, cfg.layer_norm_eps)
    x = feed_forward(p["ffn2"], x) * 0.5 + res
    return layer_norm(p["final_layer_norm"], x, cfg.layer_norm_eps)


def forward(params: Params, cfg: W2VBertConfig,
            input_features: jnp.ndarray,
            attention_mask: Optional[jnp.ndarray] = None,
            dtype: jnp.dtype = jnp.float32,
            remat: bool = False,
            attention_impl: str = "xla") -> jnp.ndarray:
    """[B, L, 160] features (+ bool [B, L] mask) -> fp32 [B, L, vocab]."""
    B, L, _ = input_features.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, L), jnp.bool_)
    pad_mask = attention_mask.astype(jnp.float32)

    x = input_features.astype(dtype)
    fp = params["feature_projection"]
    x = layer_norm(fp["layer_norm"], x, cfg.layer_norm_eps)
    x = dense(fp["projection"], x)

    # Zero padded positions once at encoder entry (HF semantics).
    x = x * pad_mask[..., None].astype(dtype)
    attn_bias = ((1.0 - pad_mask) * -1e9)[:, None, None, :]

    def body(h, layer_p):
        fn = encoder_layer
        if remat:
            fn = jax.checkpoint(encoder_layer,
                                static_argnums=(1, 5))
        return fn(layer_p, cfg, h, attn_bias.astype(jnp.float32),
                  pad_mask, attention_impl), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    logits = dense(params["lm_head"], x.astype(jnp.float32))
    return logits.astype(jnp.float32)


def greedy_ctc_ids(logits: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None,
                   pad_id: int = 0) -> jnp.ndarray:
    """Frame-level argmax; padded frames forced to the blank/pad id so
    host-side decoding can treat the batch uniformly."""
    ids = jnp.argmax(logits, axis=-1)
    if mask is not None:
        ids = jnp.where(mask, ids, pad_id)
    return ids
