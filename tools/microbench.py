"""TPU microbenchmarks that drive kernel design decisions.

Measures the primitive costs that matter for the codec pipelines:
sort, gather (global and segment-local), one-hot matmul gather,
associative scan, cumsum — on 64K-element blocks.

Run on the real chip: python tools/microbench.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    N = 1 << 16
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N, size=N, dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, N, size=N, dtype=np.int32))
    seg_idx = jnp.asarray(rng.integers(0, 64, size=(N // 64, 64), dtype=np.int32))
    seg_vals = jnp.asarray(rng.integers(0, 2**30, size=(N // 64, 64), dtype=np.int32))
    bytes_u8 = jnp.asarray(rng.integers(0, 256, size=N, dtype=np.uint8))

    bench = {}

    bench["sort_u32_64k"] = timeit(jax.jit(jnp.sort), keys)
    bench["argsort_u32_64k"] = timeit(jax.jit(jnp.argsort), keys)
    bench["sort_pairs_64k"] = timeit(
        jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), keys, vals)
    bench["gather_64k"] = timeit(jax.jit(lambda v, i: v[i]), vals, idx)
    bench["gather_64k_x17"] = timeit(
        jax.jit(lambda v, i: functools.reduce(lambda a, _: a[i], range(17), v)),
        vals, idx)
    bench["take_along_seg64"] = timeit(
        jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=1)), seg_vals, seg_idx)

    def onehot_gather(v, i):
        oh = (i[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2))
        return jnp.einsum("gts,gs->gt", oh.astype(jnp.float32),
                          v.astype(jnp.float32)).astype(jnp.int32)
    bench["onehot_gather_seg64"] = timeit(jax.jit(onehot_gather), seg_vals, seg_idx)

    bench["cumsum_64k"] = timeit(jax.jit(lambda v: jnp.cumsum(v)), vals)
    bench["assoc_scan_max_64k"] = timeit(
        jax.jit(lambda v: jax.lax.associative_scan(jnp.maximum, v)), vals)
    bench["cummax_64k"] = timeit(jax.jit(lambda v: jax.lax.cummax(v)), vals)

    def seg_doubling(v):
        # 6 rounds of within-segment pointer doubling (the commit-scan core).
        p = v % 64
        for _ in range(6):
            p = jnp.where(p >= 64, p, jnp.take_along_axis(p.reshape(-1, 64), (p % 64).reshape(-1, 64), axis=1).reshape(-1))
        return p
    bench["seg_doubling_6r"] = timeit(jax.jit(seg_doubling), vals)

    def scatter_add(v, i):
        return jnp.zeros(N, jnp.int32).at[i].add(v)
    bench["scatter_add_64k"] = timeit(jax.jit(scatter_add), vals, idx)
    def scatter_max(v, i):
        return jnp.zeros(N, jnp.int32).at[i].max(v)
    bench["scatter_max_64k"] = timeit(jax.jit(scatter_max), vals, idx)

    # Sliding 4-byte windows from bytes (encode stage 0).
    def windows(b):
        x = b.astype(jnp.uint32)
        return x + jnp.roll(x, -1) * 256 + jnp.roll(x, -2) * 65536 + jnp.roll(x, -3) * 16777216
    bench["u32_windows_64k"] = timeit(jax.jit(windows), bytes_u8)

    # vmapped over 48 blocks (3MB corpus worth) to see batching behavior.
    blocks = jnp.asarray(rng.integers(0, 2**32, size=(48, N), dtype=np.uint32))
    bench["sort_48x64k"] = timeit(jax.jit(lambda b: jnp.sort(b, axis=-1)), blocks)
    bidx = jnp.asarray(rng.integers(0, N, size=(48, N), dtype=np.int32))
    bench["gather_48x64k"] = timeit(
        jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=-1)),
        blocks.astype(jnp.int32), bidx)

    for k, v in bench.items():
        print(f"{k:26s} {v*1e6:10.1f} us")


if __name__ == "__main__":
    main()
