"""Fine-tuning driver test: a tiny model must overfit a tiny synthetic
manifest (CTC loss decreases) on the CPU mesh."""

import json

import numpy as np
import pytest

from audio_processor_tpu.io import wav
from audio_processor_tpu.models.tokenizer import CTCVocab
from audio_processor_tpu.training.finetune import (
    FinetuneConfig, encode_text, finetune, load_manifest,
)


def test_encode_text():
    v = CTCVocab.darija_default()
    ids = encode_text("ab c", v)
    assert ids == [v.vocab["a"], v.vocab["b"], v.vocab["|"], v.vocab["c"]]
    # unknown characters are dropped
    assert encode_text("a#b", v) == [v.vocab["a"], v.vocab["b"]]


@pytest.mark.slow
def test_finetune_loss_decreases(tmp_path):
    import jax

    from audio_processor_tpu.models import wav2vec2bert as w2v

    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        p = tmp_path / f"u{i}.wav"
        tone = 0.3 * np.sin(2 * np.pi * (200 + 50 * i)
                            * np.arange(8000) / 16000)
        wav.write(p, tone[None, :].astype(np.float32), 16000)
        rows.append({"audio": str(p), "text": "salam"})
    manifest = tmp_path / "train.jsonl"
    manifest.write_text("\n".join(json.dumps(r) for r in rows))

    vocab = CTCVocab.darija_default()
    mcfg = w2v.W2VBertConfig(vocab_size=len(vocab), hidden_size=32,
                             num_hidden_layers=1, num_attention_heads=2,
                             intermediate_size=64,
                             conv_depthwise_kernel_size=7,
                             left_max_position_embeddings=8,
                             right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), mcfg)
    cfg = FinetuneConfig(manifest=str(manifest),
                         output_dir=str(tmp_path / "out"),
                         batch_size=4, num_steps=60,
                         learning_rate=3e-4, max_audio_sec=0.5,
                         checkpoint_every=0)
    final_params, losses = finetune(cfg, model_cfg=mcfg, params=params,
                                    vocab=vocab)
    assert len(losses) >= 3
    assert losses[-1] < losses[0] * 0.8, losses
    # final checkpoint written
    assert (tmp_path / "out" / "step_60" / "params").exists()


def test_load_manifest(tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text('{"audio": "a.wav", "text": "x"}\n\n'
                 '{"audio": "b.wav", "text": "y"}\n')
    rows = load_manifest(p)
    assert len(rows) == 2 and rows[1]["text"] == "y"
