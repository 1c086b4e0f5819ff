"""Full-geometry HF -> JAX checkpoint conversion (slow).

The tiny-config parity tests (test_wav2vec2bert, test_asr_engine)
can't catch shape/layout bugs that only appear at the production
w2v-bert-2.0 geometry (hidden 1024, 24 layers, heads 16, ffn 4096,
rel-pos 64/8). This builds a random-weight full-size
``Wav2Vec2BertForCTC``, runs the real ``save_pretrained`` ->
``load_or_convert_w2v_bert`` path (including the Orbax cache
round-trip), and spot-checks logits against the torch fp32 forward.
Reference model load: services/audio_processor.py:54-69.
"""

import json

import numpy as np
import pytest
import torch

from audio_processor_tpu.models import wav2vec2bert as w2v
from audio_processor_tpu.models.checkpoint import load_or_convert_w2v_bert

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def full_checkpoint(tmp_path_factory):
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertForCTC

    torch.manual_seed(0)
    hf_cfg = Wav2Vec2BertConfig(
        vocab_size=44,
        position_embeddings_type="relative_key",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        conformer_conv_dropout=0.0, apply_spec_augment=False,
    )
    # full w2v-bert-2.0 geometry is the config default; assert so a
    # transformers upgrade can't silently shrink this test
    assert hf_cfg.hidden_size == 1024 and hf_cfg.num_hidden_layers == 24
    assert hf_cfg.intermediate_size == 4096
    model = Wav2Vec2BertForCTC(hf_cfg)
    model.eval()
    d = tmp_path_factory.mktemp("w2v_full")
    model.save_pretrained(d)
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3,
             "|": 4, **{chr(ord("a") + i): 5 + i for i in range(26)},
             **{f"x{i}": 31 + i for i in range(13)}}
    (d / "vocab.json").write_text(json.dumps(vocab))
    return model, hf_cfg, d


def test_full_geometry_convert_and_forward(full_checkpoint, rng):
    model, hf_cfg, d = full_checkpoint
    params, cfg, vocab = load_or_convert_w2v_bert(d)
    assert cfg.hidden_size == 1024 and cfg.num_hidden_layers == 24
    assert vocab and vocab["<pad>"] == 0

    # stacked-layer geometry
    k = params["layers"]["self_attn"]["linear_q"]["kernel"]
    assert k.shape == (24, 1024, 1024)
    assert params["lm_head"]["kernel"].shape == (1024, 44)

    B, L = 2, 40
    feats = (0.1 * rng.standard_normal((B, L, 160))).astype(np.float32)
    mask = np.ones((B, L), bool)
    mask[1, 30:] = False

    with torch.no_grad():
        ref = model(
            input_features=torch.tensor(feats),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).logits.numpy()

    import jax.numpy as jnp

    logits = np.asarray(w2v.forward(params, cfg, jnp.asarray(feats),
                                    jnp.asarray(mask)))
    np.testing.assert_allclose(logits[0], ref[0], atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(logits[1, :30], ref[1, :30],
                               atol=2e-3, rtol=1e-3)
    # greedy CTC ids identical where valid
    assert (logits[0].argmax(-1) == ref[0].argmax(-1)).all()


def test_orbax_cache_roundtrip_is_used(full_checkpoint):
    """Second load must restore from the Orbax cache and bit-match."""
    _, _, d = full_checkpoint
    from audio_processor_tpu.models.checkpoint import cache_dir_for

    params1, cfg1, _ = load_or_convert_w2v_bert(d)   # may convert
    assert cache_dir_for(d).exists()
    params2, cfg2, _ = load_or_convert_w2v_bert(d)   # must hit cache
    assert cfg1 == cfg2
    a = params1["layers"]["ffn1"]["intermediate_dense"]["kernel"]
    b = params2["layers"]["ffn1"]["intermediate_dense"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
