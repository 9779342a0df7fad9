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


def test_place_monotone_windows():
    from tpu_snappy.ops.pallas import place as P
    rng = np.random.default_rng(11)
    m = 8 * 1024
    # Emission-shaped destinations: monotone, +1/+2 steps, sprinkled inactive.
    steps = rng.integers(1, 3, m)
    dest = np.cumsum(steps).astype(np.int32) - 1
    active = rng.random(m) < 0.8
    vals = rng.integers(0, 256, m, dtype=np.int32)
    out_rows = 136  # covers max dest ~16K
    d = np.where(active, dest, P.SENT).astype(np.int32)
    y, ovf = P.place_block(jnp.asarray(d), jnp.asarray(vals), out_rows)
    assert int(ovf) == 0
    ref = np.zeros(out_rows * 128, np.int32)
    ref[dest[active]] = vals[active]
    assert (np.asarray(y) == ref).all()


def test_place_window_overflow_detected():
    from tpu_snappy.ops.pallas import place as P
    # One tile whose active destinations span far more than the window:
    # the violating write must be counted (and dropped, not misplaced).
    m = 1024
    d = np.full(m, P.SENT, np.int32)
    d[0], d[1023] = 0, 10000
    vals = np.full(m, 7, np.int32)
    y, ovf = P.place_block(jnp.asarray(d), jnp.asarray(vals), 136)
    assert int(ovf) == 1
    y = np.asarray(y)
    assert y[0] == 7 and y[10000] == 0


def test_place_encode_lane_equivalence():
    # The kernel and the reference placement sort must produce the identical
    # encoded stream on real data (the contract encode_block relies on when
    # switching paths by platform).
    from tpu_snappy.ops import encode as E
    from tpu_snappy import format as fmt
    from tpu_snappy.utils import corpus
    datas = [b"The quick brown fox jumps over the lazy dog. " * 300]
    if corpus.has_reference_corpus():
        datas.append(corpus.load("fox-in-socks.txt"))
        datas.append(corpus.load("all-mtg-cards.txt")[:fmt.BLOCK_SIZE])
    for data in datas:
        n = min(len(data), fmt.BLOCK_SIZE)
        buf = np.zeros(fmt.BLOCK_SIZE, np.uint8)
        buf[:n] = np.frombuffer(data[:n], np.uint8)
        blocks = jnp.asarray(buf)[None]
        lens = jnp.full((1,), n, jnp.int32)
        out_s, tot_s = E.encode_blocks(blocks, lens, placement="sort")
        out_k, tot_k = E.encode_blocks(blocks, lens, placement="kernel")
        assert int(tot_s[0]) == int(tot_k[0])
        assert (np.asarray(out_s) == np.asarray(out_k)).all()


def _fixed_point(src):
    s = src.copy()
    for _ in range(17):
        s2 = s[s]
        if (s2 == s).all():
            break
        s = s2
    return s


def test_resolve_chains():
    from tpu_snappy.ops.pallas import resolve as R
    rng = np.random.default_rng(21)
    lit = rng.integers(0, 256, N, dtype=np.int32)
    # Mixed chain shapes: self-maps, short hops, a deep RLE-style run.
    src = np.arange(N, dtype=np.int32)
    copies = rng.choice(np.arange(1, N), 20000, replace=False)
    src[copies] = np.maximum(copies - rng.integers(1, 64, 20000), 0)  # back hops
    src[40000:50000] = np.arange(40000, 50000) - 1     # depth-10000 chain
    y = np.asarray(R.resolve_block(jnp.asarray(lit), jnp.asarray(src)))
    assert (y == lit[_fixed_point(src)]).all()


def test_resolve_identity_and_worstcase():
    from tpu_snappy.ops.pallas import resolve as R
    lit = np.arange(N, dtype=np.int32) & 0xFF
    ident = np.arange(N, dtype=np.int32)
    y = np.asarray(R.resolve_block(jnp.asarray(lit), jnp.asarray(ident)))
    assert (y == lit).all()
    # Full-depth chain: every position points one back (RLE of period 1).
    chain = np.maximum(ident - 1, 0)
    y = np.asarray(R.resolve_block(jnp.asarray(lit), jnp.asarray(chain)))
    assert (y == lit[0]).all()


def test_tiled_resolve_chains():
    """Tile-sequential resolve: exact on mixed chains, identity, full-depth
    RLE, and cross-tile hops (sources strictly decrease by construction)."""
    from tpu_snappy.ops.pallas import tiledres as TR
    rng = np.random.default_rng(33)
    lit = rng.integers(0, 256, N, dtype=np.int32)
    ident = np.arange(N, dtype=np.int32)

    # Random decreasing map: every lane jumps to min(p, random) — long
    # cross-tile chains plus plenty of fixpoints.
    src = np.minimum(ident, rng.integers(0, N, N)).astype(np.int32)
    y = np.asarray(TR.resolve_tiled(jnp.asarray(lit), jnp.asarray(src)))
    assert (y == lit[_fixed_point(src)]).all()

    # Identity and the depth-65535 period-1 chain (worst legal stream).
    y = np.asarray(TR.resolve_tiled(jnp.asarray(lit), jnp.asarray(ident)))
    assert (y == lit).all()
    chain = np.maximum(ident - 1, 0)
    y = np.asarray(TR.resolve_tiled(jnp.asarray(lit), jnp.asarray(chain)))
    assert (y == lit[0]).all()

    # Hops that repeatedly straddle tile boundaries by one position.
    src = np.maximum(ident - (ident % TR.TILE) - 1, 0).astype(np.int32)
    y = np.asarray(TR.resolve_tiled(jnp.asarray(lit), jnp.asarray(src)))
    assert (y == lit[_fixed_point(src)]).all()

    # The pair and tri variants must agree, including the pair fixup path
    # (every right tile pointing into its left sibling).
    cross = np.maximum(ident - TR.TILE, 0).astype(np.int32)
    for variant in ("pair", "tri", "grid"):
        for s in (src, cross):
            y = np.asarray(TR.resolve_tiled(
                jnp.asarray(lit), jnp.asarray(s), variant=variant))
            assert (y == lit[_fixed_point(s)]).all(), variant

    # Flagged variant: exact per-lane resolution flags replace the detect
    # body. flags[i] = "src[i] is a fixpoint"; exactness is required (an
    # over-approximation would corrupt), so build it from ground truth.
    for s in (src, cross, chain, ident,
              np.minimum(ident, rng.integers(0, N, N)).astype(np.int32)):
        flags = (s[s] == s).astype(np.int32)
        y = np.asarray(TR.resolve_tiled_flag(
            jnp.asarray(lit), jnp.asarray(s), jnp.asarray(flags)))
        assert (y == lit[_fixed_point(s)]).all(), "flag"
        # under-approximate flags (all zero) still resolve exactly —
        # they only waste rounds
        y = np.asarray(TR.resolve_tiled_flag(
            jnp.asarray(lit), jnp.asarray(s), jnp.zeros(N, np.int32)))
        assert (y == lit[_fixed_point(s)]).all(), "flag0"

    # Depth-hinted variant: exact per-tile round counts (the oracle for
    # any sidecar partial hint). Build ground truth by simulating the
    # kernel's local rounds per tile, left to right.
    def _tile_depths(s_in, tile):
        nt = N // tile
        dep = np.zeros(nt, np.int32)
        for t in range(nt):
            base = t * tile
            s = s_in[base:base + tile].copy()
            r = 0
            while True:
                in_t = s >= base
                g = np.where(in_t, s[np.clip(s - base, 0, tile - 1)], s)
                if (g == s).all():
                    break
                s = g
                r += 1
            dep[t] = r
        return dep

    for s in (src, cross, ident):
        dep = _tile_depths(s, TR.TILE)
        y = np.asarray(TR.resolve_tiled_depth(
            jnp.asarray(lit), jnp.asarray(s), jnp.asarray(dep)))
        assert (y == lit[_fixed_point(s)]).all(), "depth"

    # Dual-fragment form: each half bit-identical to the fori variant,
    # including asymmetric resolved flags (frag 0 at fixpoint, frag 1 not).
    lit2 = np.stack([lit, np.roll(lit, 7)])
    src2 = np.stack([ident, cross])
    y2 = np.asarray(TR.resolve_tiled_dual(
        jnp.asarray(lit2), jnp.asarray(src2),
        resolved2=jnp.asarray([True, False])))
    assert (y2[0] == lit2[0]).all()
    assert (y2[1] == lit2[1][_fixed_point(cross)]).all()


def test_resolve_decode_equivalence():
    # Kernel vs XLA resolution must produce identical decodes on real
    # streams, including the RLE-heavy worst case.
    from tpu_snappy.ops import decode as D
    from tpu_snappy import reference_codec as ref
    from tpu_snappy.utils import corpus
    datas = [b"abcd" * 5000, b"x" * 30000,
             bytes(np.random.default_rng(5).integers(0, 256, 3000, "u1"))]
    if corpus.has_reference_corpus():
        datas.append(corpus.load("repeating-50000.txt"))
        datas.append(corpus.load("real-50000.txt"))
    # One batched decode per mode (all streams padded to one width):
    # identical coverage, 1/5 the jit-graph count of per-stream calls.
    import tpu_snappy.format as fmt
    all_frags, all_clens, all_ulens, spans = [], [], [], []
    for data in datas:
        comp = ref.compress(data)
        _, start = fmt.varint_decode(comp)
        frags, clens, ulens = D.fragment_table(comp, start, len(data))
        spans.append((len(all_ulens), len(all_ulens) + len(ulens), data))
        all_frags.append(np.asarray(frags))
        all_clens.extend(np.asarray(clens).tolist())
        all_ulens.extend(np.asarray(ulens).tolist())
    w = D.frag_width(np.asarray(all_clens))
    frags = np.concatenate([f[:, :w] for f in all_frags])
    clens, ulens = np.asarray(all_clens), np.asarray(all_ulens)
    for resolve in ("xla", "kernel", "windowed", "plain", "hybrid",
                    "tiled", "tiledtail", "flagtail", "paratail"):
        out, ok = D.decode_fragments_jit(
            jnp.asarray(frags), jnp.asarray(clens), jnp.asarray(ulens),
            resolve=resolve)
        assert np.asarray(ok).all(), resolve
        out = np.asarray(out)
        for lo, hi, data in spans:
            got = b"".join(out[i, :ulens[i]].tobytes()
                           for i in range(lo, hi))
            assert got == data, resolve


def test_doubling_round_with_stability():
    from tpu_snappy.ops.pallas import doubling as DB
    rng = np.random.default_rng(31)
    src = np.arange(N, dtype=np.int32)
    copies = rng.choice(np.arange(1, N), 30000, replace=False)
    src[copies] = np.maximum(copies - rng.integers(1, 5000, 30000), 0)
    src[60000:63000] = np.arange(60000, 63000) - 1  # deep chain
    s = jnp.asarray(src)
    st = jnp.zeros(DB.TILES, jnp.int32)
    golden = src.copy()
    for r in range(17):
        s, st = DB.doubling_round(s, st)
        golden = golden[golden]
        sn = np.asarray(s)
        # stable tiles must be truly fixed (s[p] are fixed points)
        stn = np.asarray(st).astype(bool)
        tiles = sn.reshape(DB.TILES, 1024)
        fixed = (sn[tiles] == tiles).all(axis=1)
        assert (fixed[stn]).all()
        if stn.all():
            break
    assert (np.asarray(s) == golden).all() or (
        np.asarray(s)[np.asarray(s)] == np.asarray(s)).all()
    # converged to the same fixed point as plain doubling
    g = src.copy()
    for _ in range(17):
        g2 = g[g]
        if (g2 == g).all():
            break
        g = g2
    assert (np.asarray(s) == g).all()


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


def test_scans_cumsum_and_next_start():
    """scans.cumsum_block / next_start_block vs numpy + scan.py golden,
    at both the encoder's 64K element space and the decoder's FRAG_CAP."""
    import jax
    from tpu_snappy.ops.pallas import scans as PS
    from tpu_snappy.ops import scan

    rng = np.random.default_rng(13)
    for m in (N, 68 * 1024):
        x = rng.integers(0, 70, m).astype(np.int32)
        inc = np.asarray(PS.cumsum_block(jnp.asarray(x)))
        assert (inc == np.cumsum(x)).all()

        flags = rng.random(m) < 0.02
        got = np.asarray(PS.next_start_block(jnp.asarray(flags), m))
        want = np.asarray(scan.next_element_start(jnp.asarray(flags), m))
        assert (got == want).all()

    # edge cases: empty, first-only, last-only flags
    for f in (np.zeros(N, bool),
              np.eye(1, N, 0, dtype=bool)[0],
              np.eye(1, N, N - 1, dtype=bool)[0]):
        got = np.asarray(PS.next_start_block(jnp.asarray(f), N))
        want = np.asarray(scan.next_element_start(jnp.asarray(f), N))
        assert (got == want).all()

    # vmapped, as encode_blocks/decode_fragments use them
    xb = rng.integers(0, 70, (3, N)).astype(np.int32)
    incb = np.asarray(jax.vmap(PS.cumsum_block)(jnp.asarray(xb)))
    assert (incb == np.cumsum(xb, axis=-1)).all()
    fb = rng.random((3, N)) < 0.05
    nsb = np.asarray(jax.vmap(lambda f: PS.next_start_block(f, N))(
        jnp.asarray(fb)))
    want = np.asarray(scan.next_element_start(jnp.asarray(fb), N))
    assert (nsb == want).all()


def test_elem_fields_kernel_matches_xla():
    """fields.elem_fields_block vs decode._elem_fields on real + adversarial
    streams (every byte speculatively decoded as a tag, incl. wrap at end)."""
    from tpu_snappy.ops import decode as D
    from tpu_snappy.ops.pallas import fields as F

    rng = np.random.default_rng(11)
    cases = [
        rng.integers(0, 256, F.FRAG_CAP, dtype=np.uint8),  # random tags
        np.zeros(F.FRAG_CAP, np.uint8),                     # all len-1 literals
        np.full(F.FRAG_CAP, 255, np.uint8),                 # all copy4 max
    ]
    # a genuine compressed fragment
    from tpu_snappy import reference_codec as codec
    from tpu_snappy.utils import corpus
    comp = codec.compress(corpus.load("fox-in-socks.txt"))
    frag = np.zeros(F.FRAG_CAP, np.uint8)
    body = np.frombuffer(comp, np.uint8)[:F.FRAG_CAP]
    frag[:len(body)] = body
    cases.append(frag)

    for c in cases:
        got = F.elem_fields_block(jnp.asarray(c))
        size, outb, islit, hdr, _len, off = D._elem_fields(jnp.asarray(c))
        want = (size, outb, islit.astype(jnp.int32), hdr, off)
        for g, w in zip(got, want):
            assert (np.asarray(g) == np.asarray(w)).all()


@pytest.mark.parametrize("k", [8, 16])
def test_gather_window_chains(k):
    """Windowed gather: in-window targets gather, out-of-window don't advance.
    Golden recomputed in numpy from the documented window geometry."""
    from tpu_snappy.ops.pallas import gatherw as GW
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 16, N, dtype=np.int32)
    pos = np.arange(N)
    # backward pointers with a mix of near and far hops (idx[p] <= p)
    hops = rng.integers(0, 50000, N)
    idx = np.maximum(pos - hops, 0).astype(np.int32)
    y = np.asarray(GW.gather_window_block(
        jnp.asarray(x), jnp.asarray(idx), k=k))
    win_lo = ((pos >> 11) - (k - 1)) << 11
    want = np.where(idx >= win_lo, x[idx], idx)
    assert (y == want).all()


def test_gather_window_doubling_matches_full():
    """A windowed round composed with full rounds reaches the same fixed
    point as full-only doubling on a realistic copy-chain pointer array."""
    from tpu_snappy.ops.pallas import gatherw as GW
    rng = np.random.default_rng(8)
    pos = np.arange(N)
    src = pos.copy()
    # chains: every 3rd position points back 1..3000 bytes
    m = rng.random(N) < 0.33
    src[m] = np.maximum(pos[m] - rng.integers(1, 3000, m.sum()), 0)
    src = np.minimum(src, pos)  # backward invariant
    s_full = src.copy()
    for _ in range(17):
        s_full = s_full[s_full]
    s = jnp.asarray(src.astype(np.int32))
    for k in (8, 8, 16, 16):
        s = GW.gather_window_block(s, s, k=k)
    s = np.asarray(s)
    for _ in range(17):
        s = s[s]
    assert (s == s_full).all()


def test_window_keys_kernel():
    """Fused window-key kernel vs the XLA expression, boundary n values."""
    from tpu_snappy.ops.pallas import windows as W
    from tpu_snappy.ops import encode as E
    rng = np.random.default_rng(11)
    block = rng.integers(0, 256, N, dtype=np.uint8)
    iota = np.arange(N, dtype=np.int32)
    for n in (N, N - 1, 5000, 4, 3, 0):
        got = np.asarray(W.window_keys_block(
            jnp.asarray(block), jnp.int32(n)))
        w = np.asarray(E._windows_u32(jnp.asarray(block)))
        want = np.where(iota <= n - 4, w, np.uint32(0xFFFFFFFF))
        assert (got == want).all(), n


def test_emit_kernel_stream_equivalence():
    """The fused emit kernel (placement="emit", interpreted on CPU) must
    produce the byte-identical stream to the XLA emission lanes on real
    data, including >60-byte literal runs (random data) and RLE."""
    from tpu_snappy.ops import encode as E
    from tpu_snappy import format as fmt
    from tpu_snappy.utils import corpus
    rng = np.random.default_rng(13)
    datas = [b"The quick brown fox jumps over the lazy dog. " * 300,
             bytes(rng.integers(0, 256, 20000, "u1")),  # long literal runs
             b"ab" * 8000]                               # RLE copies
    if corpus.has_reference_corpus():
        datas.append(corpus.load("all-mtg-cards.txt")[:fmt.BLOCK_SIZE])
    # far-copy + long-literal interleavings exercise the single-lane
    # overflow/head machinery (runs > 60 and > 256, block-opening literal)
    unit = bytes(rng.integers(0, 256, 300, "u1"))
    datas.append(unit + bytes(rng.integers(0, 256, 500, "u1"))
                 + unit + bytes(rng.integers(0, 256, 2000, "u1")) + unit)
    datas.append(b"z" * 70 + unit + b"z" * 70 + unit[:64])
    for data in datas:
        n = min(len(data), fmt.BLOCK_SIZE)
        buf = np.zeros(fmt.BLOCK_SIZE, np.uint8)
        buf[:n] = np.frombuffer(data[:n], np.uint8)
        blocks = jnp.asarray(buf)[None]
        lens = jnp.full((1,), n, jnp.int32)
        out_s, tot_s = E.encode_blocks(blocks, lens, placement="sort")
        for mode in ("emit", "single", "winplace"):
            out_e, tot_e = E.encode_blocks(blocks, lens, placement=mode)
            assert int(tot_s[0]) == int(tot_e[0]), mode
            assert (np.asarray(out_s) == np.asarray(out_e)).all(), mode


def test_matcher_kernel_matches_xla():
    """Fused matcher kernel (interpreted on CPU) vs encode._matcher_xla on
    real corpus candidate tables — must be bit-identical (jump AND offset)."""
    from tpu_snappy.ops import encode as E
    from tpu_snappy.ops.pallas import matcher as M
    from tpu_snappy.utils import corpus
    import tpu_snappy.format as fmt
    rng = np.random.default_rng(17)
    # Three structures: run-ladder + random (dedup/no-match paths), dense
    # text, and the uniform-region file. (A fourth phrase-repetition case
    # was dropped: its code paths are a strict subset of the mtg block's,
    # and interpret-mode matcher runs cost ~12 s each.)
    datas = [b"ab" * 8000 + bytes(rng.integers(0, 256, 4000, "u1"))]
    if corpus.has_reference_corpus():
        datas.append(corpus.load("all-mtg-cards.txt")[:fmt.BLOCK_SIZE])
        datas.append(corpus.load("alignerTestData.txt"))
    else:
        datas.append(b"The quick brown fox. " * 600)
    iota = jnp.arange(fmt.BLOCK_SIZE, dtype=jnp.int32)
    for data in datas:
        n = min(len(data), fmt.BLOCK_SIZE)
        buf = np.zeros(fmt.BLOCK_SIZE, np.uint8)
        buf[:n] = np.frombuffer(data[:n], np.uint8)
        block = jnp.asarray(buf)
        key = E._window_keys(block, jnp.int32(n), iota)
        cands = E._candidate_offsets(key, jnp.int32(n), iota, 16, "class")
        for lazy, sticky in ((0, "exact"), (2, "exact"), (2, "sig")):
            jk, ok_ = M.matcher_block(cands, jnp.int32(n), lazy, sticky)
            jx, ox = E._matcher_xla(cands, jnp.int32(n), iota, lazy, sticky)
            assert (np.asarray(jk) == np.asarray(jx)).all(), (lazy, sticky)
            assert (np.asarray(ok_) == np.asarray(ox)).all(), (lazy, sticky)
            # and the packed-table kernel form (in-kernel 16-bit unpack)
            pref, words = E._candidate_offsets(key, jnp.int32(n), iota, 16,
                                               "class", packed=True)
            jp, op = M.matcher_block_packed(pref, words, jnp.int32(n), 16,
                                            lazy, sticky)
            assert (np.asarray(jp) == np.asarray(jx)).all(), (lazy, sticky)
            assert (np.asarray(op) == np.asarray(ox)).all(), (lazy, sticky)


def test_matcher_kernel_packed_stride2_matches_xla():
    """The stride-2 + packed kernel branch of encode_block (ULTRA's TPU
    path) interpreted on CPU vs the XLA matcher on the same pre-strided
    candidate table — _expand_stride of the packed (pref, words) form
    must be bit-identical to the unpacked XLA branch. One data case and
    one (lazy, sticky) point: interpret-mode matcher runs cost ~12 s."""
    from tpu_snappy.ops import encode as E
    from tpu_snappy.ops.pallas import matcher as M
    from tpu_snappy.utils import corpus
    import tpu_snappy.format as fmt
    if corpus.has_reference_corpus():
        data = corpus.load("all-mtg-cards.txt")[:fmt.BLOCK_SIZE]
    else:
        data = b"The quick brown fox. " * 600
    n = min(len(data), fmt.BLOCK_SIZE)
    buf = np.zeros(fmt.BLOCK_SIZE, np.uint8)
    buf[:n] = np.frombuffer(data[:n], np.uint8)
    block = jnp.asarray(buf)
    iota = jnp.arange(fmt.BLOCK_SIZE, dtype=jnp.int32)
    key = E._window_keys_strided(block, jnp.int32(n), 2)
    kiota = jnp.arange(0, fmt.BLOCK_SIZE, 2, dtype=jnp.int32)
    k, lazy, sticky = 3, 2, "sig"  # the ULTRA operating point
    pref, words = E._candidate_offsets(key, jnp.int32(n), kiota, k,
                                       "class", k, packed=True, stride=2)
    jp, op = M.matcher_block_packed(pref, words, jnp.int32(n), k,
                                    lazy, sticky)
    cands = E._candidate_offsets(key, jnp.int32(n), kiota, k, "class", k,
                                 stride=2)
    jx, ox = E._matcher_xla(cands, jnp.int32(n), iota, lazy, sticky)
    assert (np.asarray(jp) == np.asarray(jx)).all()
    assert (np.asarray(op) == np.asarray(ox)).all()


def test_scatter_windowed_transport_shape():
    # Transport-shaped destinations: nondecreasing with dump sentinels and
    # duplicate tag/payload cells (disjoint bit ranges, summed).
    from tpu_snappy.ops.pallas import scatter as S2
    rng = np.random.default_rng(31)
    m = 32 * 1024
    # strictly-increasing unique dests plus transport-style duplicates:
    # a "descriptor" (bits 8+) and a "payload byte" (bits 0-7) sharing a
    # cell sum in disjoint limb ranges.
    dest = np.minimum(np.cumsum(rng.integers(1, 3, m)), N).astype(np.int32)
    drop = rng.random(m) < 0.3
    d = np.where(drop, N, dest).astype(np.int32)
    vals = np.where(rng.random(m) < 0.5,
                    rng.integers(0, 1 << 16, m) << 8,
                    rng.integers(0, 256, m)).astype(np.int32)
    dup = (~drop) & (rng.random(m) < 0.1) & (vals >= 256)
    d2 = np.where(dup, d, N).astype(np.int32)   # second source, same cell
    v2 = np.where(dup, rng.integers(0, 256, m), 0).astype(np.int32)
    da = np.concatenate([d, d2])
    va = np.concatenate([vals, v2])
    y, ovf = S2.scatter_windowed(jnp.asarray(da), jnp.asarray(va), 3, N)
    assert int(ovf) == 0
    ref = np.zeros(N, np.int64)
    keep = da < N
    np.add.at(ref, da[keep], va[keep])
    assert (np.asarray(y).astype(np.int64) == ref).all()


def test_scatter_windowed_overflow_detected():
    from tpu_snappy.ops.pallas import scatter as S2
    m = 1024
    d = np.full(m, N, np.int32)
    d[0], d[1023] = 0, 40000  # span >> window
    vals = np.full(m, 5, np.int32)
    y, ovf = S2.scatter_windowed(jnp.asarray(d), jnp.asarray(vals), 3, N)
    assert int(ovf) == 1
    y = np.asarray(y)
    assert y[0] == 5 and y[40000] == 0


def test_gather_window_anchored():
    """Anchored windowed doubling step: exact where the per-tile window
    covers the source, no-advance (and reported) where it doesn't."""
    from tpu_snappy.ops.pallas import gatherwin as GW

    rng = np.random.default_rng(11)
    n = GW.N
    x = rng.integers(0, n, n, dtype=np.int32)
    # Mix of local hops (windowed fires) and far hops (must not advance).
    pos = np.arange(n, dtype=np.int32)
    hop = rng.integers(1, 2400, n, dtype=np.int32)
    idx = np.maximum(pos - hop, 0)
    far = rng.random(n) < 0.05
    idx[far] = rng.integers(0, n, far.sum(), dtype=np.int32)
    out, win = GW.gather_window_anchored(jnp.asarray(x), jnp.asarray(idx))
    out, win = np.asarray(out), np.asarray(win)

    tiles = idx.reshape(-1, GW.TR * GW.TC)
    anchors = np.minimum(tiles.max(axis=-1) >> 12, GW.NBLK - 2)
    lo = anchors * 4096
    inwin = (tiles >= lo[:, None]) & (tiles < (lo + 8192)[:, None])
    inwin = inwin.reshape(-1)
    assert np.array_equal(win == 1, inwin)
    assert np.array_equal(out[inwin], x[idx[inwin]])
    assert np.array_equal(out[~inwin], idx[~inwin])
    # The tile maximum source is always covered.
    assert win.reshape(-1, GW.TR * GW.TC)[
        np.arange(tiles.shape[0]), tiles.argmax(axis=-1)].all()
