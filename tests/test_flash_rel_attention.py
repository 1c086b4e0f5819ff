"""Interpret-mode validation of the custom flash+relative-bias kernel
against a dense numpy reference (models/flash_rel_attention.py)."""

import numpy as np
import pytest

from audio_processor_tpu.models.flash_rel_attention import (
    flash_rel_attention,
)

LEFT, RIGHT = 64, 8
P = LEFT + RIGHT + 1


def dense_reference(q, k, v, E, kv_mask, scale):
    L = q.shape[2]
    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    pe = E[np.clip(j - i, -LEFT, RIGHT) + LEFT]
    scores = (np.einsum("bhld,bhmd->bhlm", q, k)
              + np.einsum("bhld,lmd->bhlm", q, pe)) * scale
    scores = scores + (kv_mask[:, None, None, :] - 1.0) * 1e9
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhlm,bhmd->bhld", p, v)


def run_kernel(q, k, v, E, kv_mask, scale, variant="auto"):
    import jax.numpy as jnp

    return np.asarray(flash_rel_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(E), jnp.asarray(kv_mask),
        scale, LEFT, P, interpret=True, variant=variant))


@pytest.mark.parametrize("variant", ["stream", "onepass"])
@pytest.mark.parametrize("L", [256, 512, 768])
def test_kernel_matches_dense(rng, L, variant):
    """Covers single-step, band-only, and fully-clipped step offsets
    (kv streams in 256-column steps)."""
    B, H, d = 1, 2, 64
    q = rng.standard_normal((B, H, L, d)).astype(np.float32)
    k = rng.standard_normal((B, H, L, d)).astype(np.float32)
    v = rng.standard_normal((B, H, L, d)).astype(np.float32)
    E = rng.standard_normal((P, d)).astype(np.float32)
    kv_mask = np.ones((B, L), np.float32)
    scale = 1.0 / np.sqrt(d)
    ref = dense_reference(q, k, v, E, kv_mask, scale)
    out = run_kernel(q, k, v, E, kv_mask, scale, variant)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("variant", ["stream", "onepass"])
def test_kernel_respects_kv_mask(rng, variant):
    B, H, L, d = 2, 1, 256, 64
    q = rng.standard_normal((B, H, L, d)).astype(np.float32)
    k = rng.standard_normal((B, H, L, d)).astype(np.float32)
    v = rng.standard_normal((B, H, L, d)).astype(np.float32)
    E = rng.standard_normal((P, d)).astype(np.float32)
    kv_mask = np.ones((B, L), np.float32)
    kv_mask[1, 200:] = 0.0
    scale = 1.0 / np.sqrt(d)
    ref = dense_reference(q, k, v, E, kv_mask, scale)
    out = run_kernel(q, k, v, E, kv_mask, scale, variant)
    np.testing.assert_allclose(out[:, :, :200], ref[:, :, :200],
                               atol=2e-5, rtol=1e-4)
    # masked-kv region must not influence earlier outputs even when
    # its values explode
    v2 = v.copy()
    v2[1, :, 200:] = 1e6
    out2 = run_kernel(q, k, v2, E, kv_mask, scale, variant)
    np.testing.assert_allclose(out2[1, :, :200], out[1, :, :200],
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("variant", ["stream", "onepass"])
def test_kernel_matches_dense_production_length(rng, variant):
    """L=1280 (25 s bucket): the rolled table wraps mod W=128 many
    times; every saturation regime and both slice offsets occur. The
    onepass variant q-tiles here (qb=640 < L) so the global-row
    offsets in the roll amount and distance grid are exercised."""
    B, H, L, d = 1, 1, 1280, 64
    q = rng.standard_normal((B, H, L, d)).astype(np.float32)
    k = rng.standard_normal((B, H, L, d)).astype(np.float32)
    v = rng.standard_normal((B, H, L, d)).astype(np.float32)
    E = rng.standard_normal((P, d)).astype(np.float32)
    kv_mask = np.ones((B, L), np.float32)
    kv_mask[0, 1000:] = 0.0
    scale = 1.0 / np.sqrt(d)
    ref = dense_reference(q, k, v, E, kv_mask, scale)
    out = run_kernel(q, k, v, E, kv_mask, scale, variant)
    np.testing.assert_allclose(out[:, :, :1000], ref[:, :, :1000],
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("variant", ["stream", "onepass"])
@pytest.mark.parametrize("seed", range(6))
def test_kernel_randomized_geometries(seed, variant):
    """Randomized sweep over (L, left, right, kv mask) — exercises the
    wrapped-roll alignment, both slice offsets, saturation selects, and
    ragged masks across bucket geometries beyond the fixed cases."""
    rng = np.random.default_rng(100 + seed)
    L = int(rng.choice([256, 512, 768, 1024]))
    left = int(rng.choice([8, 16, 64, 100]))
    right = int(rng.choice([0, 4, 8, 27]))
    P_ = left + right + 1
    B, H, d = 2, 1, 64
    q = rng.standard_normal((B, H, L, d)).astype(np.float32)
    k = rng.standard_normal((B, H, L, d)).astype(np.float32)
    v = rng.standard_normal((B, H, L, d)).astype(np.float32)
    E = rng.standard_normal((P_, d)).astype(np.float32)
    kv_mask = np.ones((B, L), np.float32)
    valid = int(rng.integers(L // 2, L + 1))
    kv_mask[1, valid:] = 0.0

    import jax.numpy as jnp

    from audio_processor_tpu.models.flash_rel_attention import (
        flash_rel_attention,
    )

    # dense reference with this geometry's clip
    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    pe = E[np.clip(j - i, -left, right) + left]
    scale = 1.0 / np.sqrt(d)
    scores = (np.einsum("bhld,bhmd->bhlm", q, k)
              + np.einsum("bhld,lmd->bhlm", q, pe)) * scale
    scores = scores + (kv_mask[:, None, None, :] - 1.0) * 1e9
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bhlm,bhmd->bhld", p, v)

    out = np.asarray(flash_rel_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(E), jnp.asarray(kv_mask),
        scale, left, P_, interpret=True, variant=variant))
    np.testing.assert_allclose(out[0], ref[0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(out[1, :, :, :], ref[1, :, :, :],
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("variant", ["stream", "onepass"])
def test_kernel_max_bucket_table(variant):
    """num_buckets == 128 == W: the band occupies every wrap residue,
    the hardest case for the mod-128 rolled table (any aliasing of the
    wrap image into the in-band region would corrupt the bias)."""
    rng = np.random.default_rng(7)
    left, right = 100, 27
    P_ = left + right + 1
    assert P_ == 128
    B, H, L, d = 1, 1, 512, 64
    q = rng.standard_normal((B, H, L, d)).astype(np.float32)
    k = rng.standard_normal((B, H, L, d)).astype(np.float32)
    v = rng.standard_normal((B, H, L, d)).astype(np.float32)
    E = rng.standard_normal((P_, d)).astype(np.float32)
    kv_mask = np.ones((B, L), np.float32)

    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    pe = E[np.clip(j - i, -left, right) + left]
    scale = 1.0 / np.sqrt(d)
    scores = (np.einsum("bhld,bhmd->bhlm", q, k)
              + np.einsum("bhld,lmd->bhlm", q, pe)) * scale
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bhlm,bhmd->bhld", p, v)

    import jax.numpy as jnp

    out = np.asarray(flash_rel_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(E), jnp.asarray(kv_mask),
        scale, left, P_, interpret=True, variant=variant))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)
