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
    # Evaluation: greedy-decode WER/CER over a held-out manifest
    # (utils/metrics.py); 0 = only after the final step.
    eval_manifest: str = ""
    eval_every: int = 0
    # Resume from output_dir/state_latest (params + Adam moments +
    # step), continuing the step count where it stopped.
    resume: bool = False
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


def _make_batch(sel: List[dict], cfg: FinetuneConfig, vocab) -> dict:
    """Featurize + label-encode ``len(sel) <= batch_size`` manifest
    rows into one padded batch (short final eval batches zero-pad the
    batch dim so the jitted shapes stay fixed)."""
    from audio_processor_tpu.dsp.fbank import log_mel_frontend
    from audio_processor_tpu.io.decode import load_audio

    T = int(cfg.max_audio_sec * cfg.sample_rate)
    B = cfg.batch_size
    audio = np.zeros((B, T), np.float32)
    lengths = np.zeros((B,), np.int32)
    labels_list = [encode_text(row["text"], vocab) for row in sel]
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
    feats, mask = log_mel_frontend(audio, lengths)
    max_lab = max(1, max((len(l) for l in labels_list), default=1))
    labels = np.zeros((B, max_lab), np.int32)
    label_mask = np.zeros((B, max_lab), np.float32)
    for i, l in enumerate(labels_list):
        labels[i, :len(l)] = l
        label_mask[i, :len(l)] = 1.0
    return {
        "features": np.asarray(feats),
        "feature_mask": np.asarray(mask, np.float32),
        "labels": labels,
        "label_mask": label_mask,
    }


def batches(rows: List[dict], cfg: FinetuneConfig, vocab,
            rng: np.random.Generator) -> Iterator[dict]:
    """Infinite shuffled stream of padded feature/label batches."""
    while True:
        order = rng.permutation(len(rows))
        for start in range(0, len(rows) - cfg.batch_size + 1,
                           cfg.batch_size):
            yield _make_batch([rows[i]
                               for i in order[start:start + cfg.batch_size]],
                              cfg, vocab)


def make_eval_fns(model_cfg, dtype):
    """(jitted forward, jitted CTC loss) for evaluate(); build ONCE
    per training run — a fresh jax.jit per eval call recompiles."""
    import jax

    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.training.train_step import ctc_loss_fn

    fwd = jax.jit(lambda p, f, m: w2v.forward(p, model_cfg, f, m,
                                              dtype=dtype))
    loss = jax.jit(lambda p, b: ctc_loss_fn(p, model_cfg, b,
                                            dtype=dtype, remat=False))
    return fwd, loss


def evaluate(params, model_cfg, vocab, rows: List[dict],
             cfg: FinetuneConfig, dtype=None,
             forward_fn=None, loss_fn=None) -> dict:
    """One pass over ``rows``: greedy CTC decode -> corpus WER/CER +
    mean CTC loss. ``forward_fn``/``loss_fn`` let callers reuse
    jitted/sharded functions across eval rounds (make_eval_fns)."""
    import jax
    import jax.numpy as jnp

    from audio_processor_tpu.models.tokenizer import batch_decode
    from audio_processor_tpu.utils.metrics import cer, wer

    if dtype is None:
        dtype = jnp.float32 if jax.default_backend() == "cpu" \
            else jnp.bfloat16
    if forward_fn is None or loss_fn is None:
        fwd, ls = make_eval_fns(model_cfg, dtype)
        forward_fn = forward_fn or fwd
        loss_fn = loss_fn or ls

    refs: List[str] = []
    hyps: List[str] = []
    losses: List[float] = []
    B = cfg.batch_size
    for start in range(0, len(rows), B):
        sel = rows[start:start + B]
        batch = _make_batch(sel, cfg, vocab)
        logits = forward_fn(params, batch["features"],
                            batch["feature_mask"].astype(bool))
        ids = np.asarray(jnp.argmax(logits, axis=-1))
        texts = batch_decode(ids[:len(sel)], vocab,
                             mask=batch["feature_mask"][:len(sel)],
                             skip_special_tokens=True)
        hyps.extend(texts)
        refs.extend(row["text"].lower() for row in sel)
        # loss over the zero-padded batch rows would skew the mean;
        # only full batches contribute
        if len(sel) == B:
            losses.append(float(loss_fn(params, batch)))
    return {
        "wer": wer(refs, hyps),
        "cer": cer(refs, hyps),
        "loss": float(np.mean(losses)) if losses else float("nan"),
        "num_utterances": len(refs),
    }


def _state_dir(output_dir) -> Path:
    return Path(output_dir) / "state_latest"


def save_train_state(state, output_dir) -> Path:
    """Full-fidelity resume point: params + optimizer moments + step
    (the params-only checkpoints from _save restart Adam cold)."""
    import orbax.checkpoint as ocp

    path = _state_dir(output_dir).absolute()
    with ocp.StandardCheckpointer() as c:
        c.save(path, {"params": state.params,
                      "opt_state": state.opt_state,
                      "step": state.step}, force=True)
        c.wait_until_finished()
    return path


def load_train_state(state, output_dir):
    """Restore into the structure of a freshly-initialised ``state``
    (orbax needs the optax pytree as a restore target)."""
    import orbax.checkpoint as ocp

    path = _state_dir(output_dir).absolute()
    with ocp.StandardCheckpointer() as c:
        back = c.restore(path, {"params": state.params,
                                "opt_state": state.opt_state,
                                "step": state.step})
    return state._replace(params=back["params"],
                          opt_state=back["opt_state"],
                          step=back["step"])


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

    start_step = 0
    if cfg.resume and _state_dir(cfg.output_dir).exists():
        state = load_train_state(state, cfg.output_dir)
        start_step = int(state.step)
        logger.info("resumed from %s at step %d",
                    _state_dir(cfg.output_dir), start_step)

    rows = load_manifest(cfg.manifest)
    if len(rows) < cfg.batch_size:
        raise ValueError(
            f"manifest has {len(rows)} rows < batch_size {cfg.batch_size}")
    eval_rows = load_manifest(cfg.eval_manifest) if cfg.eval_manifest \
        else []
    rng = np.random.default_rng(cfg.seed)
    stream = batches(rows, cfg, vocab, rng)

    eval_fns = [None]    # built on first eval, reused after

    def run_eval(step):
        if eval_fns[0] is None:
            eval_fns[0] = make_eval_fns(model_cfg, dtype)
        fwd, ls = eval_fns[0]
        metrics = evaluate(state.params, model_cfg, vocab, eval_rows,
                           cfg, dtype=dtype, forward_fn=fwd,
                           loss_fn=ls)
        logger.info("eval @ step %d: WER %.4f CER %.4f loss %.4f "
                    "(%d utts)", step, metrics["wer"], metrics["cer"],
                    metrics["loss"], metrics["num_utterances"])
        return metrics

    losses: List[float] = []
    last_eval = None
    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        for step in range(start_step, cfg.num_steps):
            batch = next(stream)
            state, loss = step_fn(state, batch)
            if step % 10 == 0 or step == cfg.num_steps - 1:
                loss_val = float(loss)
                losses.append(loss_val)
                logger.info("step %d loss %.4f", step, loss_val)
            if cfg.checkpoint_every and (step + 1) % cfg.checkpoint_every == 0:
                _save(state.params, model_cfg, vocab, cfg.output_dir,
                      step + 1)
                save_train_state(state, cfg.output_dir)
            if eval_rows and cfg.eval_every and \
                    (step + 1) % cfg.eval_every == 0:
                last_eval = run_eval(step + 1)
    save_train_state(state, cfg.output_dir)
    if eval_rows:
        last_eval = run_eval(cfg.num_steps)
    _save(state.params, model_cfg, vocab, cfg.output_dir, cfg.num_steps,
          metrics=last_eval)
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


def _save(params, model_cfg, vocab, output_dir, step, metrics=None):
    import dataclasses as dc

    from audio_processor_tpu.models.checkpoint import save_params

    out = Path(output_dir) / f"step_{step}"
    meta = {"config": dc.asdict(model_cfg),
            "vocab": vocab.vocab, "step": step}
    if metrics:
        meta["eval"] = metrics
    try:
        save_params(params, out, metadata=meta)
        logger.info("checkpoint saved to %s", out)
    except Exception as e:
        logger.warning("checkpoint save failed: %s", e)
if __name__ == "__main__":
    import sys

    sys.exit(main())
