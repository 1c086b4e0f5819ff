"""CTC fine-tuning step (data + tensor parallel via pjit).

The reference is inference-only, but its ASR model is an HF CTC
fine-tune; this module provides the TPU-native training counterpart:
CTC loss (optax), AdamW, and a jit-compiled train step whose batch is
sharded over the mesh 'data' axis and whose attention/FFN weights can
shard over 'model' (see parallel/mesh.py). Used by the multi-chip
dry-run entry point and available for fine-tuning Darija checkpoints.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from audio_processor_tpu.models import wav2vec2bert as w2v


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class SpecAugment(NamedTuple):
    """SpecAugment spans on the fbank features (the training-time
    masking HF's Wav2Vec2Bert applies when apply_spec_augment=True;
    the reference never trains, so this is a beyond-reference
    capability of the fine-tuning stack)."""

    num_time_masks: int = 2
    time_mask_span: int = 10     # 10 x 20 ms frames = 200 ms
    num_freq_masks: int = 2
    freq_mask_span: int = 10     # mel bins (masked in BOTH sub-frames)
    mel_bins: int = 80           # the stacked-feature period (fbank)


def spec_augment(key: jax.Array, feats: jnp.ndarray,
                 aug: SpecAugment) -> jnp.ndarray:
    """Randomly zero time spans and mel bands of [B, T, F] feats.
    jit-friendly (static span counts/lengths, dynamic positions).

    The 160-dim features are TWO stacked 80-mel frames
    (dsp/fbank.py stride-2 stacking), so a frequency band is masked
    modulo ``mel_bins`` — zeroing both sub-frames; masking a raw
    contiguous span of the stacked axis would leave the same mel bins
    visible in the other sub-frame."""
    B, T, F = feats.shape
    kt, kf = jax.random.split(key)
    bins = aug.mel_bins if F % aug.mel_bins == 0 else F

    def span_mask(k, n_masks, span, size, idx_vals):
        if n_masks <= 0 or span <= 0:
            return jnp.zeros((B,) + idx_vals.shape, bool)
        starts = jax.random.randint(k, (B, n_masks), 0,
                                    max(1, size - span + 1))
        idx = idx_vals[None, None, :]
        hit = (idx >= starts[:, :, None]) & (idx < starts[:, :, None] + span)
        return jnp.any(hit, axis=1)                      # [B, len(idx)]

    tmask = span_mask(kt, aug.num_time_masks, aug.time_mask_span, T,
                      jnp.arange(T))
    fmask = span_mask(kf, aug.num_freq_masks, aug.freq_mask_span, bins,
                      jnp.arange(F) % bins)
    drop = tmask[:, :, None] | fmask[:, None, :]
    return jnp.where(drop, 0.0, feats)


def make_optimizer(learning_rate: float = 1e-5,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def ctc_loss_fn(params, cfg: w2v.W2VBertConfig, batch: Dict[str, jnp.ndarray],
                dtype=jnp.bfloat16, remat: bool = True,
                augment: SpecAugment | None = None) -> jnp.ndarray:
    """Mean CTC loss over the batch.

    batch: features [B, T, 160], feature_mask [B, T] (1 = valid),
    labels [B, N] int32, label_mask [B, N] (1 = valid); with
    ``augment``, also ``rng`` (a PRNG key for the SpecAugment draws).
    """
    feats = batch["features"]
    if augment is not None:
        feats = spec_augment(batch["rng"], feats, augment)
    logits = w2v.forward(params, cfg, feats,
                         batch["feature_mask"].astype(bool),
                         dtype=dtype, remat=remat)
    logit_paddings = 1.0 - batch["feature_mask"].astype(jnp.float32)
    label_paddings = 1.0 - batch["label_mask"].astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings,
                             batch["labels"], label_paddings,
                             blank_id=cfg.pad_token_id)
    return jnp.mean(per_seq)


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               cfg: w2v.W2VBertConfig,
               tx: optax.GradientTransformation,
               dtype=jnp.bfloat16,
               augment: SpecAugment | None = None,
               augment_seed: int = 0,
               opt_shardings=None) -> Tuple[TrainState, jnp.ndarray]:
    if augment is not None and "rng" not in batch:
        # Per-step key derived INSIDE the compiled step: no host-side
        # split (a device dispatch per step through slow transports)
        # and no extra sharded input.
        key = jax.random.fold_in(jax.random.PRNGKey(augment_seed),
                                 state.step)
        batch = {**batch, "rng": key}
    loss, grads = jax.value_and_grad(ctc_loss_fn)(
        state.params, cfg, batch, dtype=dtype, augment=augment)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    if opt_shardings is not None:
        # ZeRO-1: pin the refreshed moments to their 'data'-sharded
        # layout so XLA doesn't re-replicate them at the step boundary
        opt_state = jax.lax.with_sharding_constraint(
            opt_state, opt_shardings)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def init_state(params, tx: optax.GradientTransformation, mesh=None,
               cfg: w2v.W2VBertConfig | None = None,
               zero1: bool = False) -> TrainState:
    """Build a TrainState; with a mesh, params (and the optimizer state,
    which mirrors them) are placed with the tensor-parallel shardings.
    ``zero1`` additionally shards the Adam moments across the 'data'
    axis (optimizer-state sharding): memory for m/v drops by the dp
    factor, paid with the update all-gather XLA inserts at
    apply_updates."""
    if mesh is not None:
        from audio_processor_tpu.parallel.mesh import shard_params

        params = shard_params(params, mesh, cfg)
    opt_state = tx.init(params)
    if mesh is not None and zero1:
        from audio_processor_tpu.parallel.mesh import opt_state_shardings

        sh = opt_state_shardings(opt_state, params, mesh, cfg)
        opt_state = jax.tree.map(jax.device_put, opt_state, sh)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: w2v.W2VBertConfig,
                    tx: optax.GradientTransformation,
                    mesh=None, dtype=jnp.bfloat16,
                    augment: SpecAugment | None = None,
                    augment_seed: int = 0,
                    opt_shardings=None):
    """jit-compiled train step. With a mesh, the batch shards over the
    'data' axis; params/opt_state keep the shardings they were placed
    with (init_state), so XLA derives the dp+tp program and inserts
    ICI collectives (psum of grads over 'data', activation collectives
    over 'model'). With ``augment``, the per-step SpecAugment key is
    folded from (augment_seed, state.step) inside the compiled step."""
    step_fn = functools.partial(train_step, cfg=cfg, tx=tx, dtype=dtype,
                                augment=augment,
                                augment_seed=augment_seed,
                                opt_shardings=opt_shardings)
    if mesh is None:
        return jax.jit(step_fn)

    from jax.sharding import NamedSharding, PartitionSpec as P

    # Sequence parallelism: when the mesh has a 'seq' axis of size
    # > 1, activation time dims shard over it as well — elementwise /
    # norm / projection work splits T-wise and XLA all-gathers where
    # attention and the depthwise conv need the full sequence.
    seq = "seq" if mesh.shape.get("seq", 1) > 1 else None
    data2 = NamedSharding(mesh, P("data", seq))
    data3 = NamedSharding(mesh, P("data", seq, None))
    lab2 = NamedSharding(mesh, P("data", None))
    batch_sh = {"features": data3, "feature_mask": data2,
                "labels": lab2, "label_mask": lab2}
    return jax.jit(step_fn, in_shardings=(None, batch_sh))
