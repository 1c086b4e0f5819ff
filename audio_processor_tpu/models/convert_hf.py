"""HF torch checkpoint -> JAX parameter conversion.

Converts ``Wav2Vec2BertForCTC`` state dicts (the reference's ASR
checkpoint format, services/audio_processor.py:54-59) and BERT-style
sequence classifiers into the stacked-layer param trees used by this
framework. Torch is only required at conversion time, never at
inference time; converted trees can be saved/loaded with Orbax.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from audio_processor_tpu.models.wav2vec2bert import W2VBertConfig


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def convert_w2v_bert_layer(sd: Dict[str, Any], i: int) -> Dict[str, Any]:
    p = f"wav2vec2_bert.encoder.layers.{i}"
    return {
        "ffn1_layer_norm": _ln(sd, f"{p}.ffn1_layer_norm"),
        "ffn1": {
            "intermediate_dense": _linear(sd, f"{p}.ffn1.intermediate_dense"),
            "output_dense": _linear(sd, f"{p}.ffn1.output_dense"),
        },
        "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
        "self_attn": {
            "linear_q": _linear(sd, f"{p}.self_attn.linear_q"),
            "linear_k": _linear(sd, f"{p}.self_attn.linear_k"),
            "linear_v": _linear(sd, f"{p}.self_attn.linear_v"),
            "linear_out": _linear(sd, f"{p}.self_attn.linear_out"),
            "distance_embedding": _np(
                sd[f"{p}.self_attn.distance_embedding.weight"]),
        },
        "conv_module": {
            "layer_norm": _ln(sd, f"{p}.conv_module.layer_norm"),
            # torch Conv1d 1x1 weight [out, in, 1] -> dense kernel [in, out]
            "pointwise_conv1": {"kernel": _np(
                sd[f"{p}.conv_module.pointwise_conv1.weight"])[:, :, 0].T},
            # torch depthwise weight [H, 1, K] -> [K, H]
            "depthwise_conv": {"kernel": _np(
                sd[f"{p}.conv_module.depthwise_conv.weight"])[:, 0, :].T},
            "depthwise_layer_norm": _ln(
                sd, f"{p}.conv_module.depthwise_layer_norm"),
            "pointwise_conv2": {"kernel": _np(
                sd[f"{p}.conv_module.pointwise_conv2.weight"])[:, :, 0].T},
        },
        "ffn2_layer_norm": _ln(sd, f"{p}.ffn2_layer_norm"),
        "ffn2": {
            "intermediate_dense": _linear(sd, f"{p}.ffn2.intermediate_dense"),
            "output_dense": _linear(sd, f"{p}.ffn2.output_dense"),
        },
        "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
    }


def convert_w2v_bert_ctc(state_dict: Dict[str, Any],
                         cfg: W2VBertConfig) -> Dict[str, Any]:
    """Full CTC model state dict -> stacked JAX param tree."""
    sd = {k: v for k, v in state_dict.items()}
    layers = [convert_w2v_bert_layer(sd, i)
              for i in range(cfg.num_hidden_layers)]
    import jax

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    return {
        "feature_projection": {
            "layer_norm": _ln(sd, "wav2vec2_bert.feature_projection.layer_norm"),
            "projection": _linear(
                sd, "wav2vec2_bert.feature_projection.projection"),
        },
        "layers": stacked,
        "lm_head": _linear(sd, "lm_head"),
    }


def load_w2v_bert_from_pretrained(model_path: str):
    """Load an HF checkpoint directory and convert.

    Returns (params, W2VBertConfig, vocab: dict or None).
    """
    import torch  # local import: conversion-time only
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertForCTC

    hf_cfg = Wav2Vec2BertConfig.from_pretrained(model_path)
    model = Wav2Vec2BertForCTC.from_pretrained(
        model_path, torch_dtype=torch.float32, attn_implementation="eager")
    cfg = W2VBertConfig.from_hf(hf_cfg)
    params = convert_w2v_bert_ctc(model.state_dict(), cfg)
    vocab = None
    try:
        from transformers import Wav2Vec2CTCTokenizer

        tok = Wav2Vec2CTCTokenizer.from_pretrained(model_path)
        vocab = tok.get_vocab()
    except Exception:
        pass
    return params, cfg, vocab


# ----------------------------------------------------------------------
# BERT sequence classifier (text sentiment, models/bert.py)
# ----------------------------------------------------------------------

def convert_bert_classifier(state_dict: Dict[str, Any],
                            num_layers: int) -> Dict[str, Any]:
    """HF ``BertForSequenceClassification`` state dict -> param tree
    matching models/bert.py."""
    import jax

    sd = dict(state_dict)

    def layer(i: int) -> Dict[str, Any]:
        p = f"bert.encoder.layer.{i}"
        return {
            "attention": {
                "query": _linear(sd, f"{p}.attention.self.query"),
                "key": _linear(sd, f"{p}.attention.self.key"),
                "value": _linear(sd, f"{p}.attention.self.value"),
                "output": _linear(sd, f"{p}.attention.output.dense"),
                "output_layer_norm": _ln(
                    sd, f"{p}.attention.output.LayerNorm"),
            },
            "intermediate": _linear(sd, f"{p}.intermediate.dense"),
            "output": _linear(sd, f"{p}.output.dense"),
            "output_layer_norm": _ln(sd, f"{p}.output.LayerNorm"),
        }

    layers = [layer(i) for i in range(num_layers)]
    return {
        "embeddings": {
            "word_embeddings": _np(
                sd["bert.embeddings.word_embeddings.weight"]),
            "position_embeddings": _np(
                sd["bert.embeddings.position_embeddings.weight"]),
            "token_type_embeddings": _np(
                sd["bert.embeddings.token_type_embeddings.weight"]),
            "layer_norm": _ln(sd, "bert.embeddings.LayerNorm"),
        },
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
        "pooler": _linear(sd, "bert.pooler.dense"),
        "classifier": _linear(sd, "classifier"),
    }
