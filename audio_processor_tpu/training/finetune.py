"""CTC fine-tuning driver for Wav2Vec2Bert.

The reference consumes a fine-tuned Darija checkpoint but cannot
produce one; this driver closes the loop TPU-natively: a JSONL
manifest (``{"audio": path, "text": transcript}`` per line) streams
through the same fbank frontend as inference, labels encode with the
CTC vocab, and training runs the dp+tp-sharded step from
training/train_step.py with Orbax checkpointing.

Usage:
    from audio_processor_tpu.training.finetune import FinetuneConfig, finetune
    finetune(FinetuneConfig(manifest="train.jsonl", output_dir="ckpt"))
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class FinetuneConfig:
    manifest: str = ""
    output_dir: str = "./finetune_ckpt"
    init_checkpoint: str = ""       # HF dir to start from ("" = scratch)
    batch_size: int = 8
    num_steps: int = 1000
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    max_audio_sec: float = 25.0
    sample_rate: int = 16000
    checkpoint_every: int = 500
    mesh_shape: Optional[dict] = None
    zero1: bool = False             # shard Adam moments over 'data'
    seed: int = 0
    # SpecAugment (HF apply_spec_augment counterpart); 0 masks = off.
    spec_augment: bool = True
    num_time_masks: int = 2
    time_mask_span: int = 10
    num_freq_masks: int = 2
    freq_mask_span: int = 10


def load_manifest(path: str | Path) -> List[dict]:
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def encode_text(text: str, vocab) -> List[int]:
    """Character-level CTC label encoding with the inference vocab
    (spaces map to the word delimiter token)."""
    ids = []
    for ch in text.lower():
        tok = vocab.word_delimiter_token if ch == " " else ch
        idx = vocab.vocab.get(tok)
        if idx is not None:
            ids.append(idx)
    return ids


def batches(rows: List[dict], cfg: FinetuneConfig, vocab,
            rng: np.random.Generator) -> Iterator[dict]:
    """Infinite shuffled stream of padded feature/label batches."""
    from audio_processor_tpu.dsp.fbank import log_mel_frontend
    from audio_processor_tpu.io.decode import load_audio

    T = int(cfg.max_audio_sec * cfg.sample_rate)
    while True:
        order = rng.permutation(len(rows))
        for start in range(0, len(rows) - cfg.batch_size + 1,
                           cfg.batch_size):
            sel = [rows[i] for i in order[start:start + cfg.batch_size]]
            audio = np.zeros((cfg.batch_size, T), np.float32)
            lengths = np.zeros((cfg.batch_size,), np.int32)
            labels_list = []
            for i, row in enumerate(sel):
                wf, sr = load_audio(row["audio"])
                if sr != cfg.sample_rate:
                    from audio_processor_tpu.dsp.resample import resample_np

                    wf = resample_np(wf, sr, cfg.sample_rate)
                mono = np.asarray(wf, np.float32).mean(0) \
                    if wf.ndim == 2 else np.asarray(wf, np.float32)
                n = min(mono.shape[0], T)
                audio[i, :n] = mono[:n]
                lengths[i] = n
                labels_list.append(encode_text(row["text"], vocab))
            feats, mask = log_mel_frontend(audio, lengths)
            max_lab = max(1, max(len(l) for l in labels_list))
            labels = np.zeros((cfg.batch_size, max_lab), np.int32)
            label_mask = np.zeros((cfg.batch_size, max_lab), np.float32)
            for i, l in enumerate(labels_list):
                labels[i, :len(l)] = l
                label_mask[i, :len(l)] = 1.0
            yield {
                "features": np.asarray(feats),
                "feature_mask": np.asarray(mask, np.float32),
                "labels": labels,
                "label_mask": label_mask,
            }


def finetune(cfg: FinetuneConfig, model_cfg=None, params=None,
             vocab=None) -> Tuple[dict, List[float]]:
    """Run fine-tuning; returns (final params, loss history)."""
    import jax
    import jax.numpy as jnp

    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.models.tokenizer import CTCVocab
    from audio_processor_tpu.training.train_step import (
        init_state, make_optimizer, make_train_step,
    )

    if params is None:
        if cfg.init_checkpoint:
            from audio_processor_tpu.models.checkpoint import (
                load_or_convert_w2v_bert,
            )

            params, model_cfg, vocab_dict = load_or_convert_w2v_bert(
                cfg.init_checkpoint)
            vocab = CTCVocab(vocab_dict) if vocab_dict \
                else CTCVocab.darija_default()
        else:
            vocab = vocab or CTCVocab.darija_default()
            model_cfg = model_cfg or w2v.W2VBertConfig(
                vocab_size=len(vocab))
            params = w2v.init_params(jax.random.PRNGKey(cfg.seed),
                                     model_cfg)
    vocab = vocab or CTCVocab.darija_default()

    mesh = None
    if cfg.mesh_shape:
        from audio_processor_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=cfg.mesh_shape.get("data"),
                         model=cfg.mesh_shape.get("model", 1),
                         seq=cfg.mesh_shape.get("seq", 1))

    tx = make_optimizer(cfg.learning_rate, cfg.weight_decay)
    zero1 = bool(cfg.zero1) and mesh is not None
    state = init_state(params, tx, mesh=mesh, cfg=model_cfg,
                       zero1=zero1)
    opt_sh = None
    if zero1:
        from audio_processor_tpu.parallel.mesh import opt_state_shardings

        opt_sh = opt_state_shardings(state.opt_state, state.params,
                                     mesh, model_cfg)
    dtype = jnp.float32 if jax.default_backend() == "cpu" \
        else jnp.bfloat16
    augment = None
    if cfg.spec_augment:
        from audio_processor_tpu.training.train_step import SpecAugment

        augment = SpecAugment(cfg.num_time_masks, cfg.time_mask_span,
                              cfg.num_freq_masks, cfg.freq_mask_span)
    step_fn = make_train_step(model_cfg, tx, mesh=mesh, dtype=dtype,
                              augment=augment, augment_seed=cfg.seed + 1,
                              opt_shardings=opt_sh)

    rows = load_manifest(cfg.manifest)
    if len(rows) < cfg.batch_size:
        raise ValueError(
            f"manifest has {len(rows)} rows < batch_size {cfg.batch_size}")
    rng = np.random.default_rng(cfg.seed)
    stream = batches(rows, cfg, vocab, rng)

    losses: List[float] = []
    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        for step in range(cfg.num_steps):
            batch = next(stream)
            state, loss = step_fn(state, batch)
            if step % 10 == 0 or step == cfg.num_steps - 1:
                loss_val = float(loss)
                losses.append(loss_val)
                logger.info("step %d loss %.4f", step, loss_val)
            if cfg.checkpoint_every and (step + 1) % cfg.checkpoint_every == 0:
                _save(state.params, model_cfg, vocab, cfg.output_dir,
                      step + 1)
    _save(state.params, model_cfg, vocab, cfg.output_dir, cfg.num_steps)
    return state.params, losses


def _nullcontext():
    import contextlib

    return contextlib.nullcontext()


def main(argv=None) -> int:
    """CLI: ``python -m audio_processor_tpu.training.finetune
    config.yaml`` — YAML keys map onto FinetuneConfig fields
    (mesh_shape is a {data, model, seq} dict; zero1: true shards the
    Adam moments over 'data')."""
    import argparse
    import dataclasses as dc

    import yaml

    ap = argparse.ArgumentParser(
        description="CTC fine-tuning for the wav2vec2bert ASR model")
    ap.add_argument("config", help="YAML file of FinetuneConfig fields")
    args = ap.parse_args(argv)
    with open(args.config, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    known = {f.name for f in dc.fields(FinetuneConfig)}
    unknown = set(raw) - known
    if unknown:
        ap.error(f"unknown config keys: {sorted(unknown)}")
    cfg = FinetuneConfig(**raw)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    _, losses = finetune(cfg)
    logger.info("done: %d steps, final loss %.4f", len(losses),
                losses[-1] if losses else float("nan"))
    return 0


def _save(params, model_cfg, vocab, output_dir, step):
    import dataclasses as dc

    from audio_processor_tpu.models.checkpoint import save_params

    out = Path(output_dir) / f"step_{step}"
    try:
        save_params(params, out, metadata={
            "config": dc.asdict(model_cfg),
            "vocab": vocab.vocab, "step": step})
        logger.info("checkpoint saved to %s", out)
    except Exception as e:
        logger.warning("checkpoint save failed: %s", e)
if __name__ == "__main__":
    import sys

    sys.exit(main())
