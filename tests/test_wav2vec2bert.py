"""Parity of the JAX Wav2Vec2Bert CTC model vs HF torch (tiny random
config, fp32, CPU) — validates architecture + weight conversion."""

import numpy as np
import pytest
import torch

from audio_processor_tpu.models.convert_hf import convert_w2v_bert_ctc
from audio_processor_tpu.models.wav2vec2bert import (
    W2VBertConfig, forward, greedy_ctc_ids, init_params,
)

transformers = pytest.importorskip("transformers")
from transformers import Wav2Vec2BertConfig, Wav2Vec2BertForCTC  # noqa: E402


def tiny_hf_model(vocab_size=32, seed=0):
    torch.manual_seed(seed)
    hf_cfg = Wav2Vec2BertConfig(
        vocab_size=vocab_size,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        feature_projection_input_dim=160,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=16,
        right_max_position_embeddings=4,
        position_embeddings_type="relative_key",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        conformer_conv_dropout=0.0, apply_spec_augment=False,
    )
    model = Wav2Vec2BertForCTC(hf_cfg)
    model.eval()
    return model, hf_cfg


@pytest.fixture(scope="module")
def model_pair():
    model, hf_cfg = tiny_hf_model()
    cfg = W2VBertConfig.from_hf(hf_cfg)
    params = convert_w2v_bert_ctc(model.state_dict(), cfg)
    return model, cfg, params


def test_full_forward_matches_hf(model_pair, rng):
    model, cfg, params = model_pair
    B, L = 2, 40
    feats = rng.standard_normal((B, L, 160)).astype(np.float32)
    with torch.no_grad():
        ref = model(input_features=torch.from_numpy(feats)).logits.numpy()
    ours = np.asarray(forward(params, cfg, feats))
    assert ours.shape == ref.shape == (B, L, cfg.vocab_size)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_forward_with_padding_matches_hf(model_pair, rng):
    model, cfg, params = model_pair
    B, L = 3, 48
    feats = rng.standard_normal((B, L, 160)).astype(np.float32)
    lengths = [48, 30, 17]
    mask = np.zeros((B, L), np.int32)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
        feats[i, n:] = 0.0
    with torch.no_grad():
        ref = model(input_features=torch.from_numpy(feats),
                    attention_mask=torch.from_numpy(mask)).logits.numpy()
    ours = np.asarray(forward(params, cfg, feats, mask.astype(bool)))
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(ours[i, :n], ref[i, :n],
                                   atol=2e-4, rtol=1e-3)


def test_padding_does_not_change_valid_logits(model_pair, rng):
    """Core XLA-bucketing requirement: padding to a bigger static shape
    must not change the logits of valid frames."""
    _, cfg, params = model_pair
    feats = rng.standard_normal((1, 20, 160)).astype(np.float32)
    out_small = np.asarray(forward(
        params, cfg, feats, np.ones((1, 20), bool)))
    padded = np.zeros((1, 64, 160), np.float32)
    padded[:, :20] = feats
    mask = np.zeros((1, 64), bool)
    mask[:, :20] = True
    out_big = np.asarray(forward(params, cfg, padded, mask))
    np.testing.assert_allclose(out_big[0, :20], out_small[0], atol=2e-4)


def test_greedy_ids_match_hf(model_pair, rng):
    model, cfg, params = model_pair
    feats = rng.standard_normal((2, 40, 160)).astype(np.float32)
    with torch.no_grad():
        ref_ids = model(input_features=torch.from_numpy(feats)) \
            .logits.argmax(-1).numpy()
    ours = np.asarray(greedy_ctc_ids(forward(params, cfg, feats)))
    np.testing.assert_array_equal(ours, ref_ids)


def test_bf16_forward_close_to_fp32(model_pair, rng):
    """bf16 compute path must keep argmax decisions mostly stable."""
    import jax.numpy as jnp

    _, cfg, params = model_pair
    feats = rng.standard_normal((2, 40, 160)).astype(np.float32)
    f32 = np.asarray(forward(params, cfg, feats))
    bf16 = np.asarray(forward(params, cfg, feats, dtype=jnp.bfloat16))
    assert bf16.dtype == np.float32  # logits always fp32
    agree = (f32.argmax(-1) == bf16.argmax(-1)).mean()
    assert agree > 0.95


def test_init_params_shapes():
    cfg = W2VBertConfig(vocab_size=32, hidden_size=64, num_hidden_layers=3,
                        num_attention_heads=4, intermediate_size=128,
                        conv_depthwise_kernel_size=7,
                        left_max_position_embeddings=16,
                        right_max_position_embeddings=4)
    import jax

    params = init_params(jax.random.PRNGKey(0), cfg)
    assert params["layers"]["ffn1"]["intermediate_dense"]["kernel"].shape \
        == (3, 64, 128)
    assert params["lm_head"]["kernel"].shape == (64, 32)
    out = forward(params, cfg,
                  np.zeros((1, 16, 160), np.float32))
    assert out.shape == (1, 16, 32)
