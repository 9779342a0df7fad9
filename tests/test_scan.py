"""Unit tests for the parallel-scan machinery (ops/scan.py).

CopyCompressSpec-style (CopyCompressSpec.scala:36-130): golden results
recomputed independently (a plain sequential pointer chase in numpy),
randomized over jump distributions including the adversarial shapes the
decode parse sees (giant literal jumps, all-ones, max-copy runs).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_snappy.ops import scan


def _golden_committed(jump: np.ndarray) -> np.ndarray:
    out = np.zeros(len(jump), bool)
    i = 0
    while i < len(jump):
        out[i] = True
        i += max(1, int(jump[i]))
    return out


def _cases(rng, n):
    yield np.ones(n, np.int32)                                   # all literals
    yield np.full(n, 64, np.int32)                               # max copies
    yield rng.integers(1, 65, n).astype(np.int32)                # bounded mix
    j = rng.integers(1, 6, n).astype(np.int32)                   # small + giant
    j[rng.choice(n, 20, replace=False)] = rng.integers(1000, n, 20)
    yield j
    j = np.ones(n, np.int32)                                     # one huge jump
    j[0] = n - 1
    yield j


@pytest.mark.parametrize("grouped", [False, True])
@pytest.mark.parametrize("n", [scan.S * scan.G * 17, 68 * 1024])
def test_commit_general_matches_sequential_chase(n, grouped):
    rng = np.random.default_rng(n)
    for jump in _cases(rng, n):
        got = np.asarray(scan.commit_general(jnp.asarray(jump), grouped))
        assert (got == _golden_committed(jump)).all()


def test_grouped_equals_sequential_entry_states():
    rng = np.random.default_rng(7)
    n = scan.S * scan.G * 23
    for jump in _cases(rng, n):
        maps = scan.segment_exit_maps(jnp.asarray(jump))
        a = np.asarray(scan.entry_states_sequential(maps))
        b = np.asarray(scan.entry_states_grouped(maps))
        assert (a == b).all()


def test_commit_bounded_matches_chase():
    rng = np.random.default_rng(3)
    n = 1 << 16
    jump = rng.integers(1, 65, n).astype(np.int32)
    got = np.asarray(scan.commit_bounded(jnp.asarray(jump)))
    assert (got == _golden_committed(jump)).all()


@pytest.mark.parametrize("levels", [1, 3, 6])
def test_commit_tree_matches_all_paths(levels):
    # The halving-tree entry scan (TPU encode default at 3 levels) must be
    # bit-identical to the sequential and associative paths on every
    # bounded jump distribution, with and without a batch dim.
    rng = np.random.default_rng(levels)
    n = 1 << 16
    for jump in (np.ones(n, np.int32),
                 np.full(n, 64, np.int32),
                 rng.integers(1, 65, n).astype(np.int32)):
        want = _golden_committed(jump)
        got = np.asarray(scan.commit_bounded(jnp.asarray(jump),
                                             tree_levels=levels))
        assert (got == want).all()
    batch = rng.integers(1, 65, (3, n)).astype(np.int32)
    seq = np.asarray(scan.commit_bounded(jnp.asarray(batch), sequential=True))
    tre = np.asarray(scan.commit_bounded(jnp.asarray(batch),
                                         tree_levels=levels))
    assert (seq == tre).all()


@pytest.mark.parametrize("levels", [1, 2, 3])
def test_commit_general_tree_matches_sequential(levels):
    # The general-jump halving tree (concatenated pair tables,
    # entry_states_tree_general — the decode-parse selectable path) must
    # equal the sequential entry scan for UNBOUNDED jumps: tiny jumps,
    # giant literal-run jumps that skip many segments, and mixes, with
    # and without a batch dim.
    rng = np.random.default_rng(100 + levels)
    n = 512 * 64
    cases = [np.ones(n, np.int32),
             np.full(n, 40000, np.int32)]
    for _ in range(3):
        j = rng.integers(1, 6, n)
        big = rng.random(n) < 0.02
        cases.append(np.where(big, rng.integers(64, 50000, n),
                              j).astype(np.int32))
    for jump in cases:
        jd = jnp.asarray(jump)
        seq = np.asarray(scan.commit_general(jd))
        tre = np.asarray(scan.commit_general(jd, tree_levels=levels))
        assert (seq == tre).all()
        maps = scan.segment_exit_maps(jd[None, :])
        e_seq = np.asarray(scan.entry_states_sequential(maps))
        e_tre = np.asarray(scan.entry_states_tree_general(maps, levels))
        assert (e_seq == e_tre).all()
