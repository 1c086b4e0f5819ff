"""Parity of the JAX BERT classifier vs HF torch (tiny random config)."""

import numpy as np
import pytest
import torch

from audio_processor_tpu.models.bert import BertConfig, forward
from audio_processor_tpu.models.convert_hf import convert_bert_classifier

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def model_pair():
    from transformers import BertConfig as HFBertConfig
    from transformers import BertForSequenceClassification

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64,
        num_labels=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    model = BertForSequenceClassification(hf_cfg)
    model.eval()
    cfg = BertConfig.from_hf(hf_cfg)
    params = convert_bert_classifier(model.state_dict(),
                                     hf_cfg.num_hidden_layers)
    return model, cfg, params


def test_logits_match_hf(model_pair, rng):
    model, cfg, params = model_pair
    B, L = 3, 20
    ids = rng.integers(0, 100, (B, L))
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(forward(params, cfg, ids))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_logits_match_hf_with_padding(model_pair, rng):
    model, cfg, params = model_pair
    B, L = 3, 24
    ids = rng.integers(5, 100, (B, L))
    mask = np.ones((B, L), np.int64)
    mask[1, 10:] = 0
    mask[2, 4:] = 0
    ids[mask == 0] = 0
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)).logits.numpy()
    ours = np.asarray(forward(params, cfg, ids, mask.astype(np.float32)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_softmax_probs_stable(model_pair, rng):
    """The sentiment path consumes softmax probabilities
    (sentiment_analysis.py:1136); check they're fp32-normalized."""
    import jax

    model, cfg, params = model_pair
    ids = rng.integers(0, 100, (2, 16))
    logits = forward(params, cfg, ids)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-6)
