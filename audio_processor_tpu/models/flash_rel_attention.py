"""Flash attention with in-kernel relative-key position bias (Pallas).

The conformer's relative_key attention needs
``scores[l, m] = (q_l·k_m + q_l·E[clip(m-l, -left, right)]) / sqrt(d)``.
Expanding the bias to a [B, H, L, L] tensor (what both HF and the
generic flash-attention ``ab`` input require) costs ~2.5 GB of HBM
write+read per layer at production geometry (B=48, H=16, L=1280 bf16).
This kernel keeps everything in VMEM:

- The raw distance-embedding table ``E`` ([P, d] padded to [128, d],
  a few KB) is the only bias input; each (batch, head) program
  computes its *bucketed* rel logits ``s_rel[l, p] = q_l·E[p]`` with
  one small MXU dot at its first kv step. (Earlier revisions computed
  the [B, H, L, 128] logits with an XLA einsum outside the kernel:
  that cost ~1 GB of HBM write+read per layer plus a 0.7 MB DMA per
  program — all gone.)
- The program barrel-shifts a [L, W=128] wrapped copy of its bucket
  logits so that ``t[l, c] = s_rel[l, (c - l + left) mod W]`` (one
  lane tile wide: the band is at most 128 buckets, so mod-128
  residues are unique in-band and the wrap image only lands on cells
  the saturation selects overwrite). kv positions stream in pairs of
  128-lane blocks (KB=256 columns per grid step), and the in-band
  bias for step ``ki`` is the table tiled twice — the slice offset
  ``(ki*KB) mod W`` is always 0 and no dynamic lane slicing is
  needed at all. Distances outside the band —
  almost everywhere, since the clip saturates for ``m-l`` outside
  [-left, right] — are recovered with selects of the two saturation
  columns against a distance grid ``d = d_base + ki*KB`` whose base
  (``j - l``) is built once per program into scratch. No gathers, no
  expansion matmul.
- The whole q axis is one tile; kv double-blocks stream with the
  standard online-softmax m/l/acc recurrence (fp32), so the running
  max/denominator updates run half as often as a 128-column kernel.
- Every per-step tensor op is 128-lane aligned: the saturation
  columns are broadcast once per program into [L, 128] scratches, the
  running max is tiled (not lane-sliced) before the subtraction, the
  row sum rides 64 ones-lanes appended to v (so the av matmul emits
  [acc | rowsum·ones] in one aligned dot), and the rescale factors are
  consumed as aligned 64-lane slices. Single-lane ``[:, :1]`` slices
  with implicit lane-broadcasts — the original formulation — lower to
  per-vreg shuffles on Mosaic and cost ~7 ms/layer at production
  geometry (measured: tools/profile_kernel_parts.py), ~35% of the
  whole kernel.

Semantics match ``softmax((q k^T + rel) * sm_scale + mask_bias) @ v``
with mask_bias = -1e9 on padded kv positions. Verified against a dense
reference in interpret mode (CPU tests) and against the XLA attention
path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 128             # kv lane block (Mosaic lane width)
KB = 256             # kv columns per grid step (2 blocks)
W = 128              # wrapped rel-table width (one lane tile)
# W=128 is enough: num_buckets <= 128 means the in-band residues
# (c - l + left) mod 128 are unique, and every out-of-band cell is
# overwritten by the saturation selects, so the wrap image never
# leaks. Versus the earlier W=256 double-width table this halves the
# barrel-shift traffic (7 masked rolls over [rows, 128] instead of 8
# over [rows, 256]) and halves the table scratch; kv steps stay
# aligned because KB and L are multiples of 128 (slice offset mod W
# is always 0 — still no dynamic lane slicing).


def _kernel(q_ref, k_ref, v_ref, e_ref, kvmask_ref,
            o_ref, m_scr, l_scr, acc_scr, t_scr, d_scr, lo_scr, hi_scr, *,
            sm_scale: float, kv_steps: int, seq_len: int, left: int,
            right: int, num_buckets: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        # Bucket logits for this (batch, head): s_rel[l, p] = q_l·E[p]
        # — one [L, d] x [d, 128] MXU dot, fp32 accumulation (the same
        # numbers the former outside-the-kernel einsum produced).
        srel = jax.lax.dot_general(
            q_ref[0, 0], e_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [L, 128]
        # Wrapped rolled table: t[l, c] = s_rel[l, (c - l + left) mod W]
        # — `left` is absorbed into the roll. Aligned with a log2
        # barrel shift (masked rolls) directly on the [rows, 128]
        # bucket logits (columns >= num_buckets are zero from E_pad
        # and land only on out-of-band cells the selects overwrite).
        u = srel
        rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        amount = (rows - left) & (W - 1)                # (l - left) mod W
        bit = 1
        while bit < W:
            rolled = pltpu.roll(u, bit, axis=1)
            u = jnp.where((amount & bit) != 0, rolled, u)
            bit *= 2
        t_scr[...] = u
        # Distance-grid base: d_base[l, j] = j - l for the KB columns
        # of one kv step; step ki covers distances d_base + ki*KB.
        d_scr[...] = (
            jax.lax.broadcasted_iota(jnp.int32, (seq_len, KB), 1)
            - jax.lax.broadcasted_iota(jnp.int32, (seq_len, KB), 0))
        # Saturation columns, pre-broadcast to full lane tiles ONCE
        # per program (a single-lane slice broadcast is an expensive
        # per-vreg shuffle — keep it out of the per-step loop).
        lo_scr[...] = jnp.broadcast_to(srel[:, :1], lo_scr.shape)
        hi_scr[...] = jnp.broadcast_to(
            srel[:, num_buckets - 1:num_buckets], hi_scr.shape)

    q = q_ref[0, 0]                                   # [L, d]
    k = k_ref[0, 0]                                   # [KB, d]
    v = v_ref[0, 0]                                   # [KB, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [L, KB]

    # Relative bias. In-band (-left <= m-l <= right): the rolled table
    # tiled KB//W times (KB and W both multiples of 128 keep every
    # step's slice offset at 0 — no dynamic lane slicing).
    # Out of band the clip saturates to the per-row boundary columns
    # (read as aligned [L, 128] tiles, duplicated across the KB lanes).
    d_grid = d_scr[...] + ki * KB                     # m - l
    lo = jnp.tile(lo_scr[...], (1, KB // 128))        # [L, KB]
    hi = jnp.tile(hi_scr[...], (1, KB // 128))
    rel = jnp.where(d_grid < -left, lo,
                    jnp.where(d_grid > right, hi,
                              jnp.tile(t_scr[...], (1, KB // W))))
    s = (s + rel) * sm_scale

    # Padding mask on kv positions: masked (0) -> add -1e9.
    kv_mask = kvmask_ref[0, 0]                        # [KB] {0,1}
    s = s + (kv_mask[None, :] - 1.0) * 1e9

    m_prev, l_prev = m_scr[...], l_scr[...]           # [L, 128]
    m_curr = jnp.max(s, axis=1)[:, None]              # [L, 1]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    p = jnp.exp(s - jnp.tile(m_next, (1, KB // 128)))  # aligned tile
    alpha = jnp.exp(m_prev - m_next)                  # [L, 128]
    m_scr[...] = m_next

    # Fold the row-sum reduction into the av matmul: augment v with 64
    # ones-lanes so the MXU produces [acc | rowsum·ones] in one
    # aligned dot (the widened N=128 operand costs the same MXU time
    # as the d=64 one — one 128-lane tile either way), and the rowsum
    # lands as a full aligned 64-lane block, not a single lane.
    d = v.shape[1]
    v1 = jnp.concatenate(
        [v, jnp.ones((v.shape[0], 128 - d), v.dtype)], axis=1)
    pv = jax.lax.dot(p.astype(v.dtype), v1,
                     preferred_element_type=jnp.float32)  # [L, 128]
    rowsum = pv[:, d:]                                # [L, 64], all equal
    l_scr[...] = alpha * l_prev + jnp.concatenate(
        [rowsum, rowsum], axis=1)
    acc_scr[...] = acc_scr[...] * alpha[:, :d] + pv[:, :d]

    @pl.when(ki == kv_steps - 1)
    def _finish():
        denom = jnp.maximum(l_scr[...][:, :d], 1e-37)  # [L, d] aligned
        o_ref[0, 0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _kernel_onepass(q_ref, k_ref, v_ref, e_ref, kvmask_ref, o_ref, *,
                    sm_scale: float, seq_len: int, left: int,
                    right: int, num_buckets: int, qb: int):
    """Single-kv-pass variant: each program owns a [qb, L] score tile.

    At this pipeline's bucket lengths (L <= 1280) a whole score row
    fits in VMEM, so the online-softmax m/l/alpha recurrence of the
    streaming kernel — measured at ~3.2 ms/layer of pure VPU work at
    production geometry (tools/profile_kernel_parts.py) — buys
    nothing: one plain row softmax replaces five rescale rounds.
    The q axis is tiled instead (embarrassingly parallel, no
    cross-tile state), which also deletes the m/l/acc/distance-grid
    scratch buffers; the rolled rel-table build and the ones-lane
    rowsum trick are unchanged.
    """
    qi = pl.program_id(2)
    q = q_ref[0, 0]                                   # [qb, d]
    k = k_ref[0, 0]                                   # [L, d]
    v = v_ref[0, 0]                                   # [L, d]
    L = seq_len

    # Bucket logits + wrapped rolled table, as in the streaming
    # kernel, but per q tile: rows are offset by qi*qb globally.
    srel = jax.lax.dot_general(
        q, e_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [qb, 128]
    u = srel
    rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0) + qi * qb
    amount = (rows - left) & (W - 1)                  # (gl - left) mod W
    bit = 1
    while bit < W:
        rolled = pltpu.roll(u, bit, axis=1)
        u = jnp.where((amount & bit) != 0, rolled, u)
        bit *= 2
    # u[l, c] = srel[l, (c - (qi*qb + l) + left) mod W]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [qb, L]

    # Relative bias: in-band from the rolled table (tiled mod W —
    # only one wrap image per row can be in-band since the band is
    # narrower than W), saturated rows from the boundary columns.
    d_grid = (jax.lax.broadcasted_iota(jnp.int32, (qb, L), 1)
              - jax.lax.broadcasted_iota(jnp.int32, (qb, L), 0)
              - qi * qb)                              # m - gl
    lo = jnp.broadcast_to(srel[:, :1], (qb, 128))
    hi = jnp.broadcast_to(srel[:, num_buckets - 1:num_buckets],
                          (qb, 128))
    rel = jnp.where(d_grid < -left, jnp.tile(lo, (1, L // 128)),
                    jnp.where(d_grid > right,
                              jnp.tile(hi, (1, L // 128)),
                              jnp.tile(u, (1, L // W))))
    s = (s + rel) * sm_scale
    kv_mask = kvmask_ref[0, 0]                        # [L] {0,1}
    s = s + (kv_mask[None, :] - 1.0) * 1e9

    # Plain row softmax — no running max/denominator.
    m = jnp.max(s, axis=1)[:, None]                   # [qb, 1]
    p = jnp.exp(s - jnp.tile(jnp.broadcast_to(m, (qb, 128)),
                             (1, L // 128)))
    d = v.shape[1]
    v1 = jnp.concatenate(
        [v, jnp.ones((v.shape[0], 128 - d), v.dtype)], axis=1)
    pv = jax.lax.dot(p.astype(v.dtype), v1,
                     preferred_element_type=jnp.float32)  # [qb, 128]
    denom = jnp.maximum(pv[:, d:], 1e-37)             # [qb, 64]
    o_ref[0, 0] = (pv[:, :d] / denom).astype(o_ref.dtype)


def _onepass_q_tile(L: int) -> int:
    """Largest q tile of the form L/2^k keeping the fp32 score tile
    <=8 MB (peak VMEM stays within budget with the bf16 prob copy and
    Mosaic's input double-buffering on top — chip-verified at the
    production L=1280, where the untiled qb=1280 / 6.55 MB tile is
    also the FASTEST arm: 9.49 ms/call med vs 10.01 at qb=640 and
    13.07 for the streaming kernel, tools/ab_attn_variant.py, v5e,
    B=48 H=16 d=64). Halving from L keeps qb a divisor of L; every
    bucket this pipeline uses (multiples of 256 up to 1280) yields a
    sublane-aligned row count."""
    qb = L
    while qb > 128 and qb * L * 4 > (8 << 20):
        qb //= 2
    return qb


def flash_rel_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        E: jnp.ndarray, kv_mask: jnp.ndarray,
                        sm_scale: float, left: int, num_buckets: int,
                        interpret: bool = False,
                        variant: str = "auto") -> jnp.ndarray:
    """softmax((qk^T + rel(q, E)) * sm_scale + mask) @ v.

    q/k/v: [B, H, L, d]; E: [P, d] distance-embedding table
    (P = num_buckets <= 128; padded to 128 rows internally);
    kv_mask: [B, L] float {0,1}. L must be a multiple of KB (256);
    d must be 64 (the conformer head size) so the ones-augmented av
    dot stays one 128-lane tile. The bucket logits q·E are computed
    inside the kernel (fp32 accumulation), so no [B, H, L, P] tensor
    ever exists in HBM.

    variant: "onepass" tiles the q axis and does a plain row softmax
    in one kv pass (no online-softmax recurrence — the fastest choice
    whenever a [qb, L] fp32 score tile fits VMEM, i.e. every bucket
    this pipeline uses); "stream" is the kv-streaming online-softmax
    kernel for arbitrary L; "auto" resolves to onepass (chip-measured
    27% faster at production geometry — see dispatch comment).
    """
    B, H, L, d = q.shape
    assert L % KB == 0, f"L={L} must be a multiple of {KB}"
    assert d == 64, f"head dim {d} != 64 (ones-augmented av layout)"
    assert num_buckets <= 128, "bucket table must fit one 128 lane tile"
    assert E.shape[0] == num_buckets and E.shape[1] == d, E.shape
    E_pad = jnp.pad(E.astype(q.dtype), ((0, 128 - num_buckets), (0, 0)))
    right = num_buckets - 1 - left
    if variant == "auto":
        # Chip-measured default (tools/ab_attn_variant.py, v5e, r5):
        # onepass 9.49 ms/call med (qb=L) vs stream 13.07 at the
        # production geometry (B=48 H=16 L=1280 d=64) — 27% faster,
        # identical outputs. stream remains for L where the score
        # tile can't fit VMEM (not reachable with this pipeline's
        # buckets).
        variant = "onepass"

    if variant == "onepass":
        qb = _onepass_q_tile(L)
        kernel = functools.partial(
            _kernel_onepass, sm_scale=float(sm_scale), seq_len=L,
            left=left, right=right, num_buckets=num_buckets, qb=qb)
        return pl.pallas_call(
            kernel,
            grid=(B, H, L // qb),
            in_specs=[
                pl.BlockSpec((1, 1, qb, d), lambda b, h, qi: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, L, d), lambda b, h, qi: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, L, d), lambda b, h, qi: (b, h, 0, 0)),
                pl.BlockSpec((128, d), lambda b, h, qi: (0, 0)),
                pl.BlockSpec((1, 1, L), lambda b, h, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, qb, d), lambda b, h, qi:
                                   (b, h, qi, 0)),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
            interpret=interpret,
        )(q, k, v, E_pad, kv_mask[:, None, :])

    assert variant == "stream", variant
    nk = L // KB
    grid = (B, H, nk)

    kernel = functools.partial(_kernel, sm_scale=float(sm_scale),
                               kv_steps=nk, seq_len=L, left=left,
                               right=right, num_buckets=num_buckets)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, L, d), lambda b, h, ki: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, KB, d), lambda b, h, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, KB, d), lambda b, h, ki: (b, h, ki, 0)),
            pl.BlockSpec((128, d), lambda b, h, ki: (0, 0)),
            pl.BlockSpec((1, 1, KB), lambda b, h, ki: (b, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, L, d), lambda b, h, ki:
                               (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, 128), jnp.float32),      # m
            pltpu.VMEM((L, 128), jnp.float32),      # l
            pltpu.VMEM((L, d), jnp.float32),        # acc
            pltpu.VMEM((L, W), jnp.float32),        # rolled rel table
            pltpu.VMEM((L, KB), jnp.int32),         # distance-grid base
            pltpu.VMEM((L, 128), jnp.float32),      # lo saturation tile
            pltpu.VMEM((L, 128), jnp.float32),      # hi saturation tile
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, E_pad, kv_mask[:, None, :])
