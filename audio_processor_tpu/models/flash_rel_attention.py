"""Flash attention with in-kernel relative-key position bias (Pallas).

The conformer's relative_key attention needs
``scores[l, m] = (q_l·k_m + q_l·E[clip(m-l, -left, right)]) / sqrt(d)``.
Expanding the bias to a [B, H, L, L] tensor (what both HF and the
generic flash-attention ``ab`` input require) costs two HBM round
trips of ~0.6 GB per layer. This kernel keeps everything in VMEM:

- Outside the kernel we compute the *bucketed* rel logits once:
  ``s_rel[b, h, l, p] = q·E[p]`` — P = left+right+1 buckets (73),
  padded to 128 lanes. That is ~5000x smaller than the full bias.
- Inside the kernel, each q-tile expands its [bq, 128] bucket logits
  to a width-512 clip-extended window via a tiny one-hot matmul
  (``u[l, r] = s_rel[l, clip(r-256+64, 0, P-1)]``), then aligns rows
  with a log2 barrel shift (7 masked rolls) so that
  ``u_rolled[l, c] = u[l, c - l]``; the per-(q,kv)-tile bias is then a
  contiguous dynamic slice. Fully-clipped tiles (|offset| >= 256 with
  128-blocks) reduce to broadcasting the first/last bucket column.
- Softmax runs online (standard flash m/l/acc recurrence, fp32
  accumulators), so [bq, L] is the largest score strip ever alive.

Semantics match ``softmax((q k^T + rel) * sm_scale + mask_bias) @ v``
with mask_bias = -1e9 on padded kv positions. Verified against the
XLA attention path in interpret mode (CPU tests) and on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128          # q and kv tile size
WINDOW = 512         # clip-extended rel window width
NEG_INF = -1e9


@functools.lru_cache(maxsize=8)
def _expand_matrix(num_buckets: int, left: int) -> np.ndarray:
    """[128, WINDOW] one-hot M with M[p, r] = 1 iff
    clip(r - WINDOW//2 + left, 0, num_buckets-1) == p.

    (WINDOW//2 is the window center: column r corresponds to relative
    distance r - WINDOW//2, whose bucket is clip(dist + left).)
    """
    r = np.arange(WINDOW)
    buckets = np.clip(r - WINDOW // 2 + left, 0, num_buckets - 1)
    m = np.zeros((128, WINDOW), np.float32)
    m[buckets, r] = 1.0
    return m


def _kernel(q_ref, k_ref, v_ref, srel_ref, kvmask_ref, m_expand_ref,
            o_ref, m_scr, l_scr, acc_scr, u_scr, *, sm_scale: float,
            kv_blocks: int, num_buckets: int):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        # Expand bucket logits to the width-512 window and barrel-
        # shift rows so row l is aligned at column (c - l).
        u = jax.lax.dot(srel_ref[0, 0].astype(jnp.float32),
                        m_expand_ref[...],
                        preferred_element_type=jnp.float32)  # [bq, 512]
        rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        for bit in (1, 2, 4, 8, 16, 32, 64):
            rolled = pltpu.roll(u, bit, axis=1)
            u = jnp.where((rows & bit) != 0, rolled, u)
        u_scr[...] = u

    q = q_ref[0, 0]                                   # [bq, d]
    k = k_ref[0, 0]                                   # [bk, d]
    v = v_ref[0, 0]                                   # [bk, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [bq, bk]

    # Relative bias for this tile (dynamic slice on the scratch ref —
    # lax.dynamic_slice on values is not lowered by Pallas TPU).
    off = (ki - qi) * BLOCK
    start = pl.multiple_of(
        jnp.clip(off + WINDOW // 2, 0, WINDOW - BLOCK), BLOCK)
    band = u_scr[:, pl.ds(start, BLOCK)]
    # Fully-clipped tiles broadcast the first/last *bucket* logits
    # (from the unrolled s_rel, not the rolled window).
    srel = srel_ref[0, 0].astype(jnp.float32)
    rel = jnp.where(off <= -(WINDOW // 2), srel[:, 0:1],
                    jnp.where(off >= WINDOW // 2,
                              srel[:, num_buckets - 1:num_buckets],
                              band))
    s = (s + rel) * sm_scale

    # Padding mask on kv positions: masked (0) -> add -1e9.
    kv_mask = kvmask_ref[0, 0]                        # [bk] {0,1}
    s = s + (kv_mask[None, :] - 1.0) * 1e9

    m_prev, l_prev = m_scr[...], l_scr[...]
    m_curr = jnp.max(s, axis=1)[:, None]              # [bq, 1]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    p = jnp.exp(s - m_next[:, :1])
    alpha = jnp.exp(m_prev - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
    m_scr[...] = m_next
    l_scr[...] = l_next

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
    assert L % BLOCK == 0, f"L={L} must be a multiple of {BLOCK}"
    nq = L // BLOCK
    grid = (B, H, nq, nq)

    m_expand = jnp.asarray(_expand_matrix(num_buckets, left))

    kernel = functools.partial(_kernel, sm_scale=float(sm_scale),
                               kv_blocks=nq, num_buckets=int(num_buckets))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BLOCK, d), lambda b, h, qi, ki:
                         (b, h, qi, 0)),
            pl.BlockSpec((1, 1, BLOCK, d), lambda b, h, qi, ki:
                         (b, h, ki, 0)),
            pl.BlockSpec((1, 1, BLOCK, d), lambda b, h, qi, ki:
                         (b, h, ki, 0)),
            pl.BlockSpec((1, 1, BLOCK, 128), lambda b, h, qi, ki:
                         (b, h, qi, 0)),
            pl.BlockSpec((1, 1, BLOCK), lambda b, h, qi, ki: (b, 0, ki)),
            pl.BlockSpec((128, WINDOW), lambda b, h, qi, ki: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BLOCK, d), lambda b, h, qi, ki:
                               (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, 128), jnp.float32),   # m
            pltpu.VMEM((BLOCK, 128), jnp.float32),   # l
            pltpu.VMEM((BLOCK, d), jnp.float32),     # acc
            pltpu.VMEM((BLOCK, WINDOW), jnp.float32),  # u (rel window)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(q, k, v, s_rel, kv_mask[:, None, :], m_expand)
