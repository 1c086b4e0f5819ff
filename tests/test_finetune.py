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


def test_spec_augment_masks_expected_structure():
    import jax
    import jax.numpy as jnp

    from audio_processor_tpu.training.train_step import (
        SpecAugment, spec_augment,
    )

    B, T, F = 3, 64, 160
    feats = jnp.ones((B, T, F))
    aug = SpecAugment(num_time_masks=2, time_mask_span=10,
                      num_freq_masks=1, freq_mask_span=8)
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), feats, aug))
    # some masking happened, bounded above by full spans + band (the
    # freq band repeats in BOTH stacked 80-mel sub-frames)
    dropped = (out == 0.0)
    frac = dropped.mean()
    assert 0.0 < frac <= (2 * 10 / T) + (1 * 8 / 80)
    # a masked mel bin must be gone from BOTH sub-frames
    fmask = dropped.all(axis=1)          # [B, F] fully-masked features
    np.testing.assert_array_equal(fmask[:, :80], fmask[:, 80:])
    # time masks zero whole feature columns; freq masks whole time rows
    t_fully_zero = dropped.all(axis=2)        # [B, T]
    f_fully_zero = dropped.all(axis=1)        # [B, F]
    assert t_fully_zero.any(axis=1).all() or f_fully_zero.any(axis=1).all()
    # deterministic per key
    out2 = np.asarray(spec_augment(jax.random.PRNGKey(0), feats, aug))
    np.testing.assert_array_equal(out, out2)
    # zero-mask config is the identity
    none = SpecAugment(0, 0, 0, 0)
    np.testing.assert_array_equal(
        np.asarray(spec_augment(jax.random.PRNGKey(0), feats, none)),
        np.asarray(feats))


def test_train_step_with_spec_augment_runs():
    import jax
    import jax.numpy as jnp

    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.training.train_step import (
        SpecAugment, init_state, make_optimizer, make_train_step,
    )

    cfg = w2v.W2VBertConfig(vocab_size=16, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64,
                            conv_depthwise_kernel_size=7,
                            left_max_position_embeddings=8,
                            right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-4)
    state = init_state(params, tx)
    step = make_train_step(cfg, tx, dtype=jnp.float32,
                           augment=SpecAugment())
    rng = np.random.default_rng(0)
    B, T, N = 2, 32, 6
    batch = {
        "features": rng.standard_normal((B, T, 160)).astype(np.float32),
        "feature_mask": np.ones((B, T), np.float32),
        "labels": rng.integers(1, 16, (B, N)).astype(np.int32),
        "label_mask": np.ones((B, N), np.float32),
        "rng": jax.random.PRNGKey(7),
    }
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1


def test_cli_main_validates_and_dispatches(tmp_path, monkeypatch):
    """python -m ...finetune config.yaml: YAML keys map onto
    FinetuneConfig; unknown keys fail fast; finetune() receives the
    parsed config."""
    import audio_processor_tpu.training.finetune as ft

    seen = {}
    monkeypatch.setattr(
        ft, "finetune",
        lambda cfg: seen.setdefault("cfg", cfg) and None or ({}, [1.0]))
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        "manifest: m.jsonl\nnum_steps: 3\nzero1: true\n"
        "mesh_shape: {data: 4, model: 2}\n")
    assert ft.main([str(cfg_path)]) == 0
    cfg = seen["cfg"]
    assert cfg.manifest == "m.jsonl" and cfg.num_steps == 3
    assert cfg.zero1 is True and cfg.mesh_shape == {"data": 4, "model": 2}

    bad = tmp_path / "bad.yaml"
    bad.write_text("not_a_field: 1\n")
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        ft.main([str(bad)])


def _tiny_setup(tmp_path, texts=("salam", "labas", "salam", "labas")):
    import jax

    from audio_processor_tpu.models import wav2vec2bert as w2v

    rows = []
    for i, txt in enumerate(texts):
        p = tmp_path / f"u{i}.wav"
        tone = 0.3 * np.sin(2 * np.pi * (200 + 50 * i)
                            * np.arange(8000) / 16000)
        wav.write(p, tone[None, :].astype(np.float32), 16000)
        rows.append({"audio": str(p), "text": txt})
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
    return manifest, vocab, mcfg, params


def test_evaluate_wer_cer_on_manifest(tmp_path):
    from audio_processor_tpu.training.finetune import evaluate, load_manifest

    manifest, vocab, mcfg, params = _tiny_setup(
        tmp_path, texts=("salam", "labas", "wakha"))  # 3 rows, batch 2:
    rows = load_manifest(manifest)                    # uneven final batch
    cfg = FinetuneConfig(manifest=str(manifest), batch_size=2,
                         max_audio_sec=0.5)
    m = evaluate(params, mcfg, vocab, rows, cfg)
    assert m["num_utterances"] == 3
    assert 0.0 <= m["wer"] != float("nan")
    assert m["cer"] >= 0.0
    assert np.isfinite(m["loss"])  # one full batch contributes


def test_resume_restores_exact_state(tmp_path):
    """resume=True with num_steps == saved step runs zero new steps
    and returns bitwise the saved params (full restore fidelity:
    params + step; the optimizer moments ride the same pytree)."""
    import jax

    manifest, vocab, mcfg, params = _tiny_setup(tmp_path)
    out = tmp_path / "out"
    cfg = FinetuneConfig(manifest=str(manifest), output_dir=str(out),
                         batch_size=4, num_steps=3, learning_rate=3e-4,
                         max_audio_sec=0.5, checkpoint_every=0)
    trained, losses = finetune(cfg, model_cfg=mcfg, params=params,
                               vocab=vocab)
    assert (out / "state_latest").exists()

    cfg2 = FinetuneConfig(manifest=str(manifest), output_dir=str(out),
                          batch_size=4, num_steps=3,
                          learning_rate=3e-4, max_audio_sec=0.5,
                          checkpoint_every=0, resume=True)
    resumed, losses2 = finetune(cfg2, model_cfg=mcfg, params=params,
                                vocab=vocab)
    assert losses2 == []     # nothing left to train
    for a, b in zip(jax.tree_util.tree_leaves(trained),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_during_finetune_writes_metrics(tmp_path):
    manifest, vocab, mcfg, params = _tiny_setup(tmp_path)
    out = tmp_path / "out"
    cfg = FinetuneConfig(manifest=str(manifest), output_dir=str(out),
                         batch_size=4, num_steps=2, max_audio_sec=0.5,
                         checkpoint_every=0,
                         eval_manifest=str(manifest), eval_every=0)
    finetune(cfg, model_cfg=mcfg, params=params, vocab=vocab)
    meta = json.loads((out / "step_2" / "metadata.json").read_text())
    assert "eval" in meta and set(meta["eval"]) >= {"wer", "cer", "loss"}
