"""GPipe-style pipeline parallelism for the conformer encoder.

The encoder's layer stack (a ``lax.scan`` over stacked layer params,
models/wav2vec2bert.py:358-366) splits into S stages along the layer
axis; each device on a ``stage`` mesh axis holds L/S layers and the
batch streams through as M microbatches.  Activations move stage ->
stage with ``lax.ppermute`` inside a ``shard_map`` — the TPU-native
formulation (collectives ride ICI; XLA overlaps the permute with the
next tick's compute) of what GPU frameworks build from NCCL
send/recv process groups.  The reference has no model parallelism at
all (its MultiGPUManager is process-per-GPU data parallelism,
services/multi_gpu_manager.py:294-568); this exists for scaling the
training/fine-tuning path to models deeper than one chip's HBM.

Schedule: plain GPipe fill-drain over M + S - 1 ticks — stage s
processes microbatch t - s at tick t, the last stage emits microbatch
t - (S-1).  Output is bit-identical to the unpipelined forward (same
per-layer math in the same order), which the multi-chip dryrun and
test_multidevice assert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from audio_processor_tpu.models import wav2vec2bert as w2v


def _prologue(params, cfg, input_features, attention_mask, dtype):
    """forward()'s pre-layer-stack section (wav2vec2bert.py:344-356)."""
    B, L, _ = input_features.shape
    pad_mask = attention_mask.astype(jnp.float32)
    x = input_features.astype(dtype)
    fp = params["feature_projection"]
    x = w2v.layer_norm(fp["layer_norm"], x, cfg.layer_norm_eps)
    x = w2v.dense(fp["projection"], x)
    x = x * pad_mask[..., None].astype(dtype)
    attn_bias = ((1.0 - pad_mask) * -1e9)[:, None, None, :]
    return x, attn_bias, pad_mask


def pipelined_forward(params, cfg, input_features, attention_mask,
                      mesh: Mesh, n_microbatches: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Encoder forward with the layer stack pipelined over the mesh's
    ``stage`` axis.  [B, T, 160] (+ bool [B, T] mask) -> [B, T, vocab]
    fp32 logits, equal to ``w2v.forward`` on the same params.

    B must divide into n_microbatches; num_hidden_layers into the
    stage count."""
    n_stages = mesh.shape["stage"]
    n_layers = cfg.num_hidden_layers
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    B = input_features.shape[0]
    M = n_microbatches
    assert B % M == 0, (B, M)

    x, attn_bias, pad_mask = _prologue(params, cfg, input_features,
                                       attention_mask, dtype)
    mb = B // M
    xm = x.reshape(M, mb, *x.shape[1:])
    biasm = attn_bias.reshape(M, mb, *attn_bias.shape[1:])
    padm = pad_mask.reshape(M, mb, *pad_mask.shape[1:])

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage_fn(layers_stage, xm, biasm, padm):
        s = jax.lax.axis_index("stage")

        def apply_stage(h, mb_idx):
            bias = jax.lax.dynamic_index_in_dim(
                biasm, mb_idx, keepdims=False)
            pm = jax.lax.dynamic_index_in_dim(
                padm, mb_idx, keepdims=False)

            def body(h, lp):
                return w2v.encoder_layer(
                    lp, cfg, h, bias.astype(jnp.float32), pm,
                    "xla"), None

            h, _ = jax.lax.scan(body, h, layers_stage)
            return h

        carry = jnp.zeros_like(xm[0])
        ys = jnp.zeros_like(xm)
        for t in range(M + n_stages - 1):
            feed = xm[min(t, M - 1)]
            inp = jnp.where(s == 0, feed, carry)
            mb_idx = jnp.clip(t - s, 0, M - 1)
            out = apply_stage(inp, mb_idx)
            emit = t - (n_stages - 1)
            if 0 <= emit < M:
                ys = ys.at[emit].set(
                    jnp.where(s == n_stages - 1, out, ys[emit]))
            carry = jax.lax.ppermute(out, "stage", perm)
        # replicate the last stage's outputs to every device
        return jax.lax.psum(
            jnp.where(s == n_stages - 1, ys, jnp.zeros_like(ys)),
            "stage")

    sharded = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(P("stage"), P(), P(), P()),
        out_specs=P(), check_vma=False)
    ym = sharded(params["layers"], xm, biasm, padm)
    y = ym.reshape(B, *ym.shape[2:])
    logits = w2v.dense(params["lm_head"], y.astype(jnp.float32))
    return logits.astype(jnp.float32)


def make_pipelined_forward(cfg, mesh: Mesh, n_microbatches: int,
                           dtype=jnp.float32):
    """jit-compiled pipelined forward bound to a mesh."""
    fn = functools.partial(pipelined_forward, cfg=cfg, mesh=mesh,
                           n_microbatches=n_microbatches, dtype=dtype)

    def wrapped(params, input_features, attention_mask):
        return fn(params, input_features=input_features,
                  attention_mask=attention_mask)

    return jax.jit(wrapped)


def make_pipelined_train_step(cfg, tx, mesh: Mesh, n_microbatches: int,
                              dtype=jnp.float32):
    """Pipeline-parallel CTC train step: the loss runs the encoder
    through pipelined_forward, and jax.grad differentiates straight
    through the ppermute schedule (collective-permute is linear, so
    the backward pass is the reverse pipeline — XLA derives it).
    Losses and gradients match the unpipelined train step; see
    test_multidevice.

    Production note: GPipe fill-drain keeps S-1 bubbles per M
    microbatches; choose M >= 4*S to amortize."""
    import optax

    from audio_processor_tpu.training.train_step import TrainState

    def loss_fn(params, batch):
        logits = pipelined_forward(
            params, cfg, batch["features"],
            batch["feature_mask"].astype(bool), mesh,
            n_microbatches, dtype=dtype)
        logit_paddings = 1.0 - batch["feature_mask"].astype(jnp.float32)
        label_paddings = 1.0 - batch["label_mask"].astype(jnp.float32)
        per_seq = optax.ctc_loss(logits, logit_paddings,
                                 batch["labels"], label_paddings,
                                 blank_id=cfg.pad_token_id)
        return jnp.mean(per_seq)

    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step)
