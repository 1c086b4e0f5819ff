#!/usr/bin/env python
"""Ablate the flash_rel kernel's cost components on the real chip.

Variants (timing-only; numerics of the ablated ones are wrong):
  full      — the shipped kernel
  noselect  — rel = rolled table only (no d_grid, no saturation selects)
  norel     — no bias at all (in-kernel flash baseline, same structure)

Each timed point runs the kernel REPS times inside one jit with a data
dependency so the ~25 ms tunnel dispatch overhead amortizes away.

Usage: python tools/profile_kernel_parts.py [variants...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import audio_processor_tpu.models.flash_rel_attention as fra

B, H, L, D = 48, 16, 1280, 64
NUM_BUCKETS, LEFT = 73, 64
REPS = 8
BK, KB, W = fra.BK, fra.KB, fra.W


def _kernel_variant(q_ref, k_ref, v_ref, srel_ref, kvmask_ref,
                    o_ref, m_scr, l_scr, acc_scr, t_scr, d_scr,
                    lo_scr, hi_scr, *,
                    sm_scale, kv_steps, seq_len, left, right,
                    num_buckets, mode):
    """Mirrors the SHIPPED lane-aligned kernel with pieces removed.
    Modes: full (= shipped), noselect (rel = table only), norel (no
    bias), nomax (skip the running-max recurrence; exp of raw s),
    nosoftmax (no max/exp/alpha at all), noexp (exp -> mult)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if mode in ("full", "noselect"):
            u = srel_ref[0, 0].astype(jnp.float32)
            u = jnp.concatenate([u, jnp.zeros_like(u)], axis=1)
            rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
            amount = (rows - left) & (W - 1)
            bit = 1
            while bit < W:
                rolled = pltpu.roll(u, bit, axis=1)
                u = jnp.where((amount & bit) != 0, rolled, u)
                bit *= 2
            t_scr[...] = u
        if mode == "full":
            d_scr[...] = (
                jax.lax.broadcasted_iota(jnp.int32, (seq_len, KB), 1)
                - jax.lax.broadcasted_iota(jnp.int32, (seq_len, KB), 0))
            srel = srel_ref[0, 0].astype(jnp.float32)
            lo_scr[...] = jnp.broadcast_to(srel[:, :1], lo_scr.shape)
            hi_scr[...] = jnp.broadcast_to(
                srel[:, num_buckets - 1:num_buckets], hi_scr.shape)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    if mode == "full":
        d_grid = d_scr[...] + ki * KB
        lo = jnp.tile(lo_scr[...], (1, KB // 128))
        hi = jnp.tile(hi_scr[...], (1, KB // 128))
        rel = jnp.where(d_grid < -left, lo,
                        jnp.where(d_grid > right, hi, t_scr[...]))
        s = (s + rel) * sm_scale
    elif mode == "noselect":
        s = (s + t_scr[...]) * sm_scale
    else:
        s = s * sm_scale

    kv_mask = kvmask_ref[0, 0]
    s = s + (kv_mask[None, :] - 1.0) * 1e9

    d = v.shape[1]
    v1 = jnp.concatenate(
        [v, jnp.ones((v.shape[0], 128 - d), v.dtype)], axis=1)

    if mode == "nosoftmax":
        p = s
        pv = jax.lax.dot(p.astype(v.dtype), v1,
                         preferred_element_type=jnp.float32)
        rowsum = pv[:, d:]
        l_scr[...] = l_scr[...] + jnp.concatenate([rowsum, rowsum], 1)
        acc_scr[...] = acc_scr[...] + pv[:, :d]
    elif mode == "nomax":
        p = jnp.exp(s)
        pv = jax.lax.dot(p.astype(v.dtype), v1,
                         preferred_element_type=jnp.float32)
        rowsum = pv[:, d:]
        l_scr[...] = l_scr[...] + jnp.concatenate([rowsum, rowsum], 1)
        acc_scr[...] = acc_scr[...] + pv[:, :d]
    else:
        _exp = ((lambda x: x * 0.5) if mode == "noexp" else jnp.exp)
        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev,
                             jnp.broadcast_to(m_curr, m_prev.shape))
        p = _exp(s - jnp.tile(m_next, (1, KB // 128)))
        alpha = _exp(m_prev - m_next)
        m_scr[...] = m_next

        pv = jax.lax.dot(p.astype(v.dtype), v1,
                         preferred_element_type=jnp.float32)
        rowsum = pv[:, d:]
        l_scr[...] = alpha * l_prev + jnp.concatenate([rowsum, rowsum], 1)
        acc_scr[...] = acc_scr[...] * alpha[:, :d] + pv[:, :d]

    @pl.when(ki == kv_steps - 1)
    def _finish():
        denom = jnp.maximum(l_scr[...][:, :d], 1e-37)
        o_ref[0, 0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _bare_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                 sm_scale, kv_steps, rowsum):
    """Ours minus srel/kvmask inputs, minus t/d scratches, minus the
    mask add. rowsum='ones' keeps the ones-augmented v; 'reduce' uses
    stock's jnp.sum cross-lane reduce."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale

    m_prev, l_prev = m_scr[...], l_scr[...]
    m_curr = jnp.max(s, axis=1)[:, None]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    p = jnp.exp(s - m_next[:, :1])
    alpha = jnp.exp(m_prev - m_next)
    m_scr[...] = m_next

    d = v.shape[1]
    if rowsum == "ones":
        v1 = jnp.concatenate(
            [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
        pv = jax.lax.dot(p.astype(v.dtype), v1,
                         preferred_element_type=jnp.float32)
        l_scr[...] = alpha * l_prev + pv[:, d:d + 1]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv[:, :d]
    else:
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(ki == kv_steps - 1)
    def _finish():
        denom = jnp.maximum(l_scr[...][:, :1], 1e-37)
        o_ref[0, 0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _kb640_kernel(q_ref, k_ref, v_ref, srel_ref, kvmask_ref,
                  o_ref, m_scr, l_scr, acc_scr, t_scr, *,
                  sm_scale, left, right, num_buckets):
    """Two 640-column kv steps (L=1280): the m/l recurrence runs 2x
    instead of 5x. The wrapped table phase alternates 0/128 between
    steps — handled with per-step static slices of a 3x-tiled table."""
    KB6 = 640
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        srel = srel_ref[0, 0].astype(jnp.float32)[:, :128]
        u = jnp.concatenate([srel, jnp.zeros_like(srel)], axis=1)
        rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        amount = (rows - left) & (W - 1)
        bit = 1
        while bit < W:
            rolled = pltpu.roll(u, bit, axis=1)
            u = jnp.where((amount & bit) != 0, rolled, u)
            bit *= 2
        t_scr[...] = u

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    srel = srel_ref[0, 0].astype(jnp.float32)
    lo1 = jnp.tile(srel[:, :1], (1, KB6))
    hi1 = jnp.tile(srel[:, num_buckets - 1:num_buckets], (1, KB6))
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, KB6), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, KB6), 1)
    d_grid = cols - rows + ki * KB6
    t3 = jnp.concatenate([t_scr[...]] * 3, axis=1)        # [L, 768]
    band0 = t3[:, :KB6]
    band1 = t3[:, 128:128 + KB6]
    band = jnp.where(ki == 0, band0, band1)
    rel = jnp.where(d_grid < -left, lo1,
                    jnp.where(d_grid > right, hi1, band))
    s = (s + rel) * sm_scale
    kv_mask = kvmask_ref[0, 0]
    s = s + (kv_mask[None, :] - 1.0) * 1e9

    m_prev, l_prev = m_scr[...], l_scr[...]
    m_curr = jnp.max(s, axis=1)[:, None]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    p = jnp.exp(s - jnp.tile(m_next, (1, KB6 // 128)))
    alpha = jnp.exp(m_prev - m_next)
    m_scr[...] = m_next
    d = v.shape[1]
    v1 = jnp.concatenate(
        [v, jnp.ones((v.shape[0], 128 - d), v.dtype)], axis=1)
    pv = jax.lax.dot(p.astype(v.dtype), v1,
                     preferred_element_type=jnp.float32)
    rowsum = pv[:, d:]
    l_scr[...] = alpha * l_prev + jnp.concatenate([rowsum, rowsum], 1)
    acc_scr[...] = acc_scr[...] * alpha[:, :d] + pv[:, :d]

    @pl.when(ki == 1)
    def _finish():
        denom = jnp.maximum(l_scr[...][:, :d], 1e-37)
        o_ref[0, 0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def kb640_call():
    KB6 = 640
    kernel = functools.partial(_kb640_kernel, sm_scale=1.0 / np.sqrt(D),
                               left=LEFT, right=NUM_BUCKETS - 1 - LEFT,
                               num_buckets=NUM_BUCKETS)

    def call(q, k, v, s_rel, kv_mask):
        return pl.pallas_call(
            kernel,
            grid=(B, H, L // KB6),
            in_specs=[
                pl.BlockSpec((1, 1, L, D), lambda b, h, ki: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, KB6, D), lambda b, h, ki: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, KB6, D), lambda b, h, ki: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, L, 128), lambda b, h, ki: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, KB6), lambda b, h, ki: (b, 0, ki)),
            ],
            out_specs=pl.BlockSpec((1, 1, L, D),
                                   lambda b, h, ki: (b, h, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            scratch_shapes=[
                pltpu.VMEM((L, 128), jnp.float32),
                pltpu.VMEM((L, 128), jnp.float32),
                pltpu.VMEM((L, D), jnp.float32),
                pltpu.VMEM((L, W), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(q, k, v, s_rel, kv_mask[:, None, :])
    return call


def bare_call(rowsum):
    nk = L // KB
    kernel = functools.partial(_bare_kernel, sm_scale=1.0 / np.sqrt(D),
                               kv_steps=nk, rowsum=rowsum)

    def call(q, k, v, s_rel, kv_mask):
        return pl.pallas_call(
            kernel,
            grid=(B, H, nk),
            in_specs=[
                pl.BlockSpec((1, 1, L, D), lambda b, h, ki: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, KB, D), lambda b, h, ki: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, KB, D), lambda b, h, ki: (b, h, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, L, D),
                                   lambda b, h, ki: (b, h, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            scratch_shapes=[
                pltpu.VMEM((L, 128), jnp.float32),
                pltpu.VMEM((L, 128), jnp.float32),
                pltpu.VMEM((L, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(q, k, v)
    return call


def variant_call(mode):
    right = NUM_BUCKETS - 1 - LEFT
    nk = L // KB
    kernel = functools.partial(
        _kernel_variant, sm_scale=1.0 / np.sqrt(D), kv_steps=nk,
        seq_len=L, left=LEFT, right=right, num_buckets=NUM_BUCKETS,
        mode=mode)

    def call(q, k, v, s_rel, kv_mask):
        return pl.pallas_call(
            kernel,
            grid=(B, H, nk),
            in_specs=[
                pl.BlockSpec((1, 1, L, D), lambda b, h, ki: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, KB, D), lambda b, h, ki: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, KB, D), lambda b, h, ki: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, L, 128), lambda b, h, ki: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, KB), lambda b, h, ki: (b, 0, ki)),
            ],
            out_specs=pl.BlockSpec((1, 1, L, D),
                                   lambda b, h, ki: (b, h, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            scratch_shapes=[
                pltpu.VMEM((L, 128), jnp.float32),
                pltpu.VMEM((L, 128), jnp.float32),
                pltpu.VMEM((L, D), jnp.float32),
                pltpu.VMEM((L, W), jnp.float32),
                pltpu.VMEM((L, KB), jnp.int32),
                pltpu.VMEM((L, 128), jnp.float32),
                pltpu.VMEM((L, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(q, k, v, s_rel, kv_mask[:, None, :])
    return call


def bench(name, call, args):
    @jax.jit
    def looped(q, k, v, s_rel, kv_mask):
        def body(i, carry):
            qq, acc = carry
            out = call(qq, k, v, s_rel, kv_mask)
            # data dependency so iterations serialize
            return (qq + 0.0 * out, acc + jnp.sum(out.astype(jnp.float32)))
        _, acc = jax.lax.fori_loop(0, REPS, body,
                                   (q, jnp.zeros((), jnp.float32)))
        return acc

    t0 = time.perf_counter()
    s = float(looped(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(looped(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / REPS
    print(f"{name:10s}: {per*1e3:7.2f} ms/layer-call  x24 = "
          f"{per*24*1e3:6.1f} ms  (compile {compile_s:.1f}s, "
          f"sum={s:.3e})", flush=True)
    return per


def main():
    variants = sys.argv[1:] or ["full", "noselect", "norel"]
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def dev(shape, dtype=jnp.bfloat16):
        return jax.device_put(jnp.asarray(
            rng.standard_normal(shape) * 0.05, dtype))

    q = dev((B, H, L, D))
    k = dev((B, H, L, D))
    v = dev((B, H, L, D))
    srel = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, L, 128)) * 0.05, jnp.float32))
    kv_mask = jax.device_put(jnp.ones((B, L), jnp.float32))
    float(jnp.sum(q) + jnp.sum(srel))

    for mode in variants:
        if mode == "shipped":
            # The shipped kernel takes the raw [P, d] embedding table
            # (bucket logits are computed in-kernel).
            E = jnp.asarray(
                np.random.default_rng(1).standard_normal(
                    (NUM_BUCKETS, D)) * 0.05, jnp.bfloat16)
            call = (lambda q, k, v, s_rel, kv_mask:
                    fra.flash_rel_attention(
                        q, k, v, E, kv_mask,
                        float(1.0 / np.sqrt(D)), LEFT, NUM_BUCKETS))
            bench(mode, call, (q, k, v, srel, kv_mask))
        elif mode == "kb640":
            bench(mode, kb640_call(), (q, k, v, srel, kv_mask))
        elif mode.startswith("bare"):
            rowsum = mode.split(":")[1] if ":" in mode else "ones"
            bench(mode, bare_call(rowsum), (q, k, v, srel, kv_mask))
        elif mode.startswith("stock"):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, flash_attention,
            )

            _, bq, bk = (mode.split(":") + ["1280", "256"])[:3]
            bs = BlockSizes(block_q=int(bq), block_k_major=int(bk),
                            block_k=int(bk), block_b=1)
            call = (lambda q, k, v, s_rel, kv_mask, bs=bs:
                    flash_attention(q, k, v,
                                    sm_scale=float(1.0 / np.sqrt(D)),
                                    block_sizes=bs))
            bench(mode, call, (q, k, v, srel, kv_mask))
        else:
            bench(mode, variant_call(mode), (q, k, v, srel, kv_mask))


if __name__ == "__main__":
    main()
