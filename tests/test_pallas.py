"""Pallas kernel unit tests (interpret mode on CPU).

Tier-1/2 analogue of MatchFinderTester / MemoryReadAlignerTester: drive each
kernel over adversarial index patterns with golden results recomputed in
numpy. The same kernels run compiled on real TPUs (verified there too —
notably the MXU silently rounds f32 matmul operands to bf16, which interpret
mode does NOT reproduce; hence the 8-bit-limb design)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_snappy.ops.pallas import gather as G, scatter as S

N = 1 << 16


def test_gather_random():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 16, N, dtype=np.int32)
    idx = rng.integers(0, N, N, dtype=np.int32)
    y = np.asarray(G.gather_block(jnp.asarray(x), jnp.asarray(idx)))
    assert (y == x[idx]).all()


def test_gather_patterns():
    x = np.arange(N, dtype=np.int32)
    for idx in [
        np.zeros(N, np.int32),                    # all same source
        np.full(N, N - 1, np.int32),              # last element
        np.arange(N, dtype=np.int32),             # identity
        np.arange(N, dtype=np.int32)[::-1].copy(),  # reversal
        (np.arange(N) * 127 % N).astype(np.int32),  # stride pattern
    ]:
        y = np.asarray(G.gather_block(jnp.asarray(x), jnp.asarray(idx)))
        assert (y == x[idx]).all()


def test_scatter_permutation_and_drop():
    rng = np.random.default_rng(2)
    m = 68 * 1024
    dest = np.concatenate([
        rng.permutation(N).astype(np.int32),
        np.full(m - N, N, np.int32),  # dropped writes
    ])
    rng.shuffle(dest)
    vals = rng.integers(0, 1 << 16, m, dtype=np.int32)
    y = np.asarray(S.scatter_block(jnp.asarray(dest), jnp.asarray(vals), 2))
    ref = np.zeros(N, np.int32)
    keep = dest < N
    ref[dest[keep]] = vals[keep]
    assert (y == ref).all()


@pytest.mark.parametrize("limbs,bits", [(1, 8), (2, 16), (3, 19)])
def test_scatter_limbs(limbs, bits):
    rng = np.random.default_rng(limbs)
    m = N
    dest = rng.permutation(N).astype(np.int32)
    vals = rng.integers(0, 1 << bits, m, dtype=np.int32)
    y = np.asarray(S.scatter_block(jnp.asarray(dest), jnp.asarray(vals), limbs))
    ref = np.zeros(N, np.int32)
    ref[dest] = vals
    assert (y == ref).all()


def test_scatter_sparse():
    # Mostly-dropped scatter (typical decode descriptor density).
    rng = np.random.default_rng(3)
    m = N
    dest = np.full(m, N, np.int32)
    picks = rng.choice(m, 1000, replace=False)
    dest[picks] = rng.choice(N, 1000, replace=False).astype(np.int32)
    vals = rng.integers(0, 1 << 16, m, dtype=np.int32)
    y = np.asarray(S.scatter_block(jnp.asarray(dest), jnp.asarray(vals), 2))
    ref = np.zeros(N, np.int32)
    ref[dest[picks]] = vals[picks]
    assert (y == ref).all()


def test_ffill_multi_payload():
    from tpu_snappy.ops.pallas import ffill as F
    rng = np.random.default_rng(7)
    m = 68 * 1024
    mask = rng.random(m) < 0.03
    mask[0] = True
    v1 = rng.integers(0, 1 << 19, m).astype(np.int32)
    v2 = rng.integers(0, 1 << 16, m).astype(np.int32)
    o1, o2 = F.ffill_block(jnp.asarray(mask), jnp.asarray(v1), jnp.asarray(v2))
    idx = np.arange(m)
    last = np.maximum.accumulate(np.where(mask, idx, 0))
    assert (np.asarray(o1) == v1[last]).all()
    assert (np.asarray(o2) == v2[last]).all()


def test_ffill_sparse_and_leading():
    from tpu_snappy.ops.pallas import ffill as F
    m = 1024
    mask = np.zeros(m, bool)
    mask[500] = True
    v = np.arange(m, dtype=np.int32)
    (o,) = F.ffill_block(jnp.asarray(mask), jnp.asarray(v))
    o = np.asarray(o)
    # before the first mask: original values; after: filled with v[500]
    assert (o[:500] == v[:500]).all()
    assert (o[500:] == 500).all()
