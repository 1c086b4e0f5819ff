"""int8 W8A8 inference path (models/wav2vec2bert.quantize_params +
the int8 branch of ``dense``).

This is an opt-in speed mode (config ``quantization: int8``) beyond
the reference (which runs fp16 autocast on CUDA,
services/audio_processor.py:227-231); the default bf16/fp32 path is
untouched and keeps the bit-match parity contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_processor_tpu.models import wav2vec2bert as w2v

TINY = dict(vocab_size=36, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, intermediate_size=128,
            conv_depthwise_kernel_size=7,
            left_max_position_embeddings=8,
            right_max_position_embeddings=2)


def _tiny():
    cfg = w2v.W2VBertConfig(**TINY)
    params = w2v.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_dense_int8_matches_numpy_reference():
    """The device int8 kernel math must equal an explicit numpy
    int8 reference (same quantization choices) exactly in int space."""
    rng = np.random.default_rng(1)
    k = rng.standard_normal((32, 48)).astype(np.float32)
    b = rng.standard_normal((48,)).astype(np.float32)
    x = rng.standard_normal((5, 32)).astype(np.float32)

    kq, scale = w2v._quantize_kernel(jnp.asarray(k))
    kq, scale = np.asarray(kq), np.asarray(scale)
    # numpy reference
    sx = np.maximum(np.abs(x).max(-1, keepdims=True) / 127.0, 1e-12)
    xq = np.round(x / sx).astype(np.int8)
    ref = (xq.astype(np.int32) @ kq.astype(np.int32)).astype(np.float32) \
        * sx * scale + b

    out = w2v._dense_int8(
        {"kernel_q": jnp.asarray(kq), "scale": jnp.asarray(scale),
         "bias": jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)
    assert kq.dtype == np.int8
    # Quantized weights stay in int8 range and reconstruct the kernel.
    np.testing.assert_allclose(kq * scale[None, :], k, atol=np.abs(k).max() / 127)


def test_quantized_forward_close_to_fp():
    cfg, params = _tiny()
    qp = w2v.quantize_params(params)
    x = np.random.default_rng(0).standard_normal((2, 64, 160)) \
        .astype(np.float32)
    lo = np.asarray(w2v.forward(params, cfg, jnp.asarray(x)))
    lq = np.asarray(w2v.forward(qp, cfg, jnp.asarray(x)))
    cos = (lo * lq).sum(-1) / np.sqrt(
        (lo * lo).sum(-1) * (lq * lq).sum(-1))
    assert cos.min() > 0.999
    assert (lo.argmax(-1) == lq.argmax(-1)).mean() > 0.95


def test_quantize_params_structure():
    _, params = _tiny()
    qp = w2v.quantize_params(params)
    L = qp["layers"]
    for ffn in ("ffn1", "ffn2"):
        for part in ("intermediate_dense", "output_dense"):
            d = L[ffn][part]
            assert d["kernel_q"].dtype == jnp.int8
            assert "kernel" not in d
            # stacked layer axis keeps per-layer scales
            assert d["scale"].shape[0] == 3
    for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
        assert L["self_attn"][proj]["kernel_q"].dtype == jnp.int8
    # fp-kept leaves
    assert "kernel" in qp["feature_projection"]["projection"]
    assert "kernel" in qp["lm_head"]
    assert "kernel" in L["conv_module"]["depthwise_conv"]
    # original tree untouched
    assert "kernel" in params["layers"]["ffn1"]["intermediate_dense"]


def test_engine_int8_flag(tmp_path):
    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.models.tokenizer import CTCVocab
    from audio_processor_tpu.pipeline.asr_engine import ASREngine
    from audio_processor_tpu.pipeline.chunker import split_audio

    cfg, params = _tiny()
    pcfg = PipelineConfig(quantization="int8", chunk_duration_sec=1.0,
                          overlap_sec=0.25, length_buckets_sec=(1.0,),
                          chunk_batch_size=2,
                          enable_mixed_precision=False)
    vocab = CTCVocab.darija_default()
    mcfg = w2v.W2VBertConfig(**{**TINY, "vocab_size": len(vocab)})
    engine = ASREngine(pcfg, params=w2v.init_params(
        jax.random.PRNGKey(1), mcfg), model_cfg=mcfg, vocab=vocab)
    # Engine quantized its params at init.
    assert "kernel_q" in engine.params["layers"]["ffn1"]["intermediate_dense"]
    wave = (0.1 * np.random.default_rng(0)
            .standard_normal((2, 16000 * 2))).astype(np.float32)
    rows = engine.transcribe_chunks(
        split_audio(wave, 16000, "q.wav", 1.0, 0.25))
    assert rows and all(r["error"] == "" for r in rows)

    with pytest.raises(ValueError):
        ASREngine(PipelineConfig(quantization="fp4"), params=params,
                  model_cfg=cfg, vocab=vocab)


def test_bert_quantized_close_to_fp():
    from audio_processor_tpu.models import bert as bert_mod

    cfg = bert_mod.BertConfig(
        vocab_size=200, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, num_labels=4)
    rng = np.random.default_rng(0)

    # Random params with the converter's layout.
    def dense(d_in, d_out):
        return {"kernel": jnp.asarray(
            rng.standard_normal((d_in, d_out)) * 0.05, jnp.float32),
            "bias": jnp.zeros((d_out,), jnp.float32)}

    def ln(d):
        return {"scale": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)}

    def layer():
        return {
            "attention": {
                "query": dense(64, 64), "key": dense(64, 64),
                "value": dense(64, 64), "output": dense(64, 64),
                "output_layer_norm": ln(64)},
            "intermediate": dense(64, 128),
            "output": dense(128, 64),
            "output_layer_norm": ln(64),
        }

    layers = [layer() for _ in range(2)]
    params = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                rng.standard_normal((200, 64)) * 0.05, jnp.float32),
            "position_embeddings": jnp.asarray(
                rng.standard_normal((64, 64)) * 0.05, jnp.float32),
            "token_type_embeddings": jnp.asarray(
                rng.standard_normal((2, 64)) * 0.05, jnp.float32),
            "layer_norm": ln(64)},
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "pooler": dense(64, 64),
        "classifier": dense(64, 4),
    }
    qp = bert_mod.quantize_params(params)
    ids = jnp.asarray(rng.integers(0, 200, (3, 16)), jnp.int32)
    lo = np.asarray(bert_mod.forward(params, cfg, ids))
    lq = np.asarray(bert_mod.forward(qp, cfg, ids))
    probs_o = np.exp(lo) / np.exp(lo).sum(-1, keepdims=True)
    probs_q = np.exp(lq) / np.exp(lq).sum(-1, keepdims=True)
    assert np.abs(probs_o - probs_q).max() < 0.01
    assert (lo.argmax(-1) == lq.argmax(-1)).all()
