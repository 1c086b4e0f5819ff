"""Flash attention with in-kernel relative-key position bias (Pallas).

The conformer's relative_key attention needs
``scores[l, m] = (q_l·k_m + q_l·E[clip(m-l, -left, right)]) / sqrt(d)``.
Expanding the bias to a [B, H, L, L] tensor (what both HF and the
generic flash-attention ``ab`` input require) costs two HBM round
trips of ~0.6 GB per layer. This kernel keeps everything in VMEM:

- Outside the kernel we compute the *bucketed* rel logits once:
  ``s_rel[b, h, l, p] = q·E[p]`` — P = left+right+1 buckets (73),
  padded to 128 lanes. That is ~5000x smaller than the full bias.
- Inside the kernel, each (batch, head) program expands its [L, 128]
  bucket logits into a clip-extended width-2L window via a one-hot
  matmul (``u[l, r] = s_rel[l, clip(r - L + left, 0, P-1)]``, columns
  r centered so column r holds relative distance r - L), then aligns
  rows with a log2 barrel shift (masked ``pltpu.roll``s) so that
  ``u_rolled[l, c] = u[l, c - l]``. The bias for kv block ``ki`` is
  then the contiguous static-stride slice
  ``u_rolled[:, ki*BK + L : ki*BK + L + BK]`` — no gathers anywhere.
- The whole q axis is one tile (L <= 640 for 25 s chunks), kv blocks
  stream with the standard online-softmax m/l/acc recurrence (fp32).

Semantics match ``softmax((q k^T + rel) * sm_scale + mask_bias) @ v``
with mask_bias = -1e9 on padded kv positions. Verified against a dense
reference in interpret mode (CPU tests) and against the XLA attention
path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 128             # kv tile size


@functools.lru_cache(maxsize=16)
def _expand_matrix(num_buckets: int, left: int, L: int) -> np.ndarray:
    """[128, 2L] one-hot M with M[p, r] = 1 iff
    clip(r - L + left, 0, num_buckets-1) == p (column r <-> relative
    distance r - L)."""
    r = np.arange(2 * L)
    buckets = np.clip(r - L + left, 0, num_buckets - 1)
    m = np.zeros((128, 2 * L), np.float32)
    m[buckets, r] = 1.0
    return m


def _roll_bits(L: int):
    bits = []
    b = 1
    while b < L:
        bits.append(b)
        b *= 2
    return tuple(bits)


def _kernel(q_ref, k_ref, v_ref, srel_ref, kvmask_ref, m_expand_ref,
            o_ref, m_scr, l_scr, acc_scr, u_scr, *, sm_scale: float,
            kv_blocks: int, seq_len: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        # Expand bucket logits to the width-2L window, then barrel-
        # shift row l right by l so all rows align:
        # u_rolled[l, c] = u[l, c - l].
        u = jax.lax.dot(srel_ref[0, 0].astype(jnp.float32),
                        m_expand_ref[...],
                        preferred_element_type=jnp.float32)  # [L, 2L]
        rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        for bit in _roll_bits(seq_len):
            rolled = pltpu.roll(u, bit, axis=1)
            u = jnp.where((rows & bit) != 0, rolled, u)
        u_scr[...] = u

    q = q_ref[0, 0]                                   # [L, d]
    k = k_ref[0, 0]                                   # [BK, d]
    v = v_ref[0, 0]                                   # [BK, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [L, BK]

    # Relative bias: contiguous slice of the rolled window.
    start = pl.multiple_of(ki * BK + seq_len, BK)
    rel = u_scr[:, pl.ds(start, BK)]
    s = (s + rel) * sm_scale

    # Padding mask on kv positions: masked (0) -> add -1e9.
    kv_mask = kvmask_ref[0, 0]                        # [BK] {0,1}
    s = s + (kv_mask[None, :] - 1.0) * 1e9

    m_prev, l_prev = m_scr[...], l_scr[...]
    m_curr = jnp.max(s, axis=1)[:, None]              # [L, 1]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    p = jnp.exp(s - m_next[:, :1])
    alpha = jnp.exp(m_prev - m_next)
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
    m_scr[...] = m_next

    acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ki == kv_blocks - 1)
    def _finish():
        denom = jnp.maximum(l_scr[...][:, :1], 1e-37)
        o_ref[0, 0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def flash_rel_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        s_rel: jnp.ndarray, kv_mask: jnp.ndarray,
                        sm_scale: float, left: int, num_buckets: int,
                        interpret: bool = False) -> jnp.ndarray:
    """softmax((qk^T + expand(s_rel)) * sm_scale + mask) @ v.

    q/k/v: [B, H, L, d]; s_rel: [B, H, L, 128] (bucket logits, padded
    to 128 lanes; only the first ``num_buckets`` columns are real);
    kv_mask: [B, L] float {0,1}. L must be a multiple of 128.
    """
    B, H, L, d = q.shape
    assert L % BK == 0, f"L={L} must be a multiple of {BK}"
    nk = L // BK
    grid = (B, H, nk)

    m_expand = jnp.asarray(_expand_matrix(num_buckets, left, L))

    kernel = functools.partial(_kernel, sm_scale=float(sm_scale),
                               kv_blocks=nk, seq_len=L)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, L, d), lambda b, h, ki: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, BK, d), lambda b, h, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, BK, d), lambda b, h, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, L, 128), lambda b, h, ki: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, BK), lambda b, h, ki: (b, 0, ki)),
            pl.BlockSpec((128, 2 * L), lambda b, h, ki: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, L, d), lambda b, h, ki:
                               (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, 128), jnp.float32),    # m
            pltpu.VMEM((L, 128), jnp.float32),    # l
            pltpu.VMEM((L, d), jnp.float32),      # acc
            pltpu.VMEM((L, 2 * L), jnp.float32),  # u (rel window)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, s_rel, kv_mask[:, None, :], m_expand)
