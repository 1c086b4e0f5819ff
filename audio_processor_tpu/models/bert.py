"""BERT sequence classifier in functional JAX (text sentiment heads).

Architecture-compatible with HF ``BertForSequenceClassification`` —
the reference's DarijaBERT client/agent sentiment models
(services/sentiment_analysis.py:944-1014). Post-LN encoder, GELU (erf)
intermediate, tanh pooler over [CLS], linear classifier. Weights
convert via models/convert_hf.convert_bert_classifier.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    num_labels: int = 4
    layer_norm_eps: float = 1e-12

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf_config) -> "BertConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            type_vocab_size=hf_config.type_vocab_size,
            num_labels=len(getattr(hf_config, "id2label", {})) or 2,
            layer_norm_eps=hf_config.layer_norm_eps,
        )


def _ln(p, x, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)
            * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(p, x):
    if "kernel_q" in p:
        from audio_processor_tpu.models.quant import dense_int8

        return dense_int8(p, x)
    y = jnp.matmul(x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y + p["bias"]).astype(x.dtype)


def quantize_params(params: Params) -> Params:
    """int8 W8A8 copy of the classifier params (models/quant.py):
    encoder attention q/k/v/output + FFN kernels quantized; embeddings,
    pooler, and the classifier head stay fp32."""
    from audio_processor_tpu.models.quant import copy_tree, quantize_dense

    out = copy_tree(params)
    L = out["layers"]
    for proj in ("query", "key", "value", "output"):
        L["attention"][proj] = quantize_dense(L["attention"][proj])
    for part in ("intermediate", "output"):
        L[part] = quantize_dense(L[part])
    return out


def _layer(p: Params, cfg: BertConfig, x: jnp.ndarray,
           bias: jnp.ndarray) -> jnp.ndarray:
    B, L, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_size
    a = p["attention"]
    q = _dense(a["query"], x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    k = _dense(a["key"], x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    v = _dense(a["value"], x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    probs = jax.nn.softmax(scores + bias, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhlm,bhmd->bhld", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
    x = _ln(a["output_layer_norm"], x + _dense(a["output"], ctx),
            cfg.layer_norm_eps)
    h = jax.nn.gelu(_dense(p["intermediate"], x).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    return _ln(p["output_layer_norm"], x + _dense(p["output"], h),
               cfg.layer_norm_eps)


def forward(params: Params, cfg: BertConfig, input_ids: jnp.ndarray,
            attention_mask: Optional[jnp.ndarray] = None,
            token_type_ids: Optional[jnp.ndarray] = None,
            dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] token ids -> fp32 [B, num_labels] classification logits."""
    B, L = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, L), jnp.float32)
    if token_type_ids is None:
        token_type_ids = jnp.zeros((B, L), jnp.int32)

    e = params["embeddings"]
    x = (e["word_embeddings"][input_ids]
         + e["position_embeddings"][jnp.arange(L)][None]
         + e["token_type_embeddings"][token_type_ids])
    x = _ln(e["layer_norm"], x.astype(dtype), cfg.layer_norm_eps)

    bias = ((1.0 - attention_mask.astype(jnp.float32))
            * jnp.finfo(jnp.float32).min)[:, None, None, :]

    def body(h, layer_p):
        return _layer(layer_p, cfg, h, bias), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = jnp.tanh(_dense(params["pooler"], x[:, 0, :]))
    return _dense(params["classifier"],
                  pooled.astype(jnp.float32)).astype(jnp.float32)
