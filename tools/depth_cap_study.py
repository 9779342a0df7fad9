"""Depth-capped emission feasibility study (VERDICT r2 item 2).

Question: can the encoder rebind copies whose resolution chain is deeper
than D to shallower ancestors — paying only tag upgrades (copy1->copy2)
where the rebind is representable, or literalization where it is not —
within the ratio cushion, so the raw-stream decoder needs <= ceil(log2 D)
doubling rounds and no serial tail?

Method: post-hoc rewrite walk over OWN-encoder element streams. For each
copy (in emission order, with earlier rewrites already applied):
  - chain depth = 1 + max depth over its source range;
  - if deeper than D, LIFT: repeatedly map the source range through the
    one-step source map while the step is UNIFORM on the whole range
    (all positions shift by one constant; a non-uniform step means the
    range fractures and no single replacement offset exists);
  - rebind to the shallowest uniform ancestor; if still deeper than D,
    either leave it (policy "rebind") or convert to a literal
    (policy "literalize").
Reports, per D: added bytes (tag upgrades + literalizations), residual
deep copies, post-pass depth profile, implied dense doubling rounds.

Run: JAX_PLATFORMS=cpu python tools/depth_cap_study.py [nblocks]
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def parse_elements(elems: np.ndarray):
    """(kind, hdr, length, offset, ip) per element of one fragment."""
    out = []
    ip, n = 0, len(elems)
    while ip < n:
        tag = int(elems[ip])
        kind = tag & 3
        if kind == 0:
            code = tag >> 2
            if code < 60:
                length, hdr = code + 1, 1
            else:
                extra = code - 59
                length = int.from_bytes(
                    elems[ip + 1: ip + 1 + extra].tobytes(), "little") + 1
                hdr = 1 + extra
            out.append((0, hdr, length, 0, ip))
            ip += hdr + length
        else:
            if kind == 1:
                length = ((tag >> 2) & 7) + 4
                off = ((tag >> 5) << 8) | int(elems[ip + 1])
                hdr = 2
            elif kind == 2:
                length = (tag >> 2) + 1
                off = int.from_bytes(elems[ip + 1: ip + 3].tobytes(),
                                     "little")
                hdr = 3
            else:
                length = (tag >> 2) + 1
                off = int.from_bytes(elems[ip + 1: ip + 5].tobytes(),
                                     "little")
                hdr = 5
            out.append((kind, hdr, length, off, ip))
            ip += hdr
    return out


def copy_tag_size(length: int, off: int) -> int:
    if 4 <= length <= 11 and off < 2048:
        return 2
    return 3  # copy2 covers every in-block offset


def study_block(elems: np.ndarray, ulen: int, D: int, literalize: bool):
    evs = parse_elements(elems)
    f = np.arange(ulen, dtype=np.int64)   # one-step source map
    depth = np.zeros(ulen, np.int64)
    op = 0
    added = 0
    residual = 0
    rebound = 0
    for kind, hdr, length, off, ip in evs:
        if kind == 0:
            op += length
            continue
        s = op - off
        k = 0
        # chunked RLE-aware initial range; overlap (off < length) keeps
        # depth within the element itself — treat via first off bytes
        span = min(off, length)
        cur = np.arange(s, s + span)
        d = 1 + depth[cur].max()
        if d > D:
            # LIFT: uniform-step ancestors
            while True:
                src = f[cur]
                delta = cur - src
                if (depth[cur] == 0).all():
                    break  # at literals already
                if delta.min() != delta.max() or delta.max() == 0:
                    break  # fractured (or self-map mixed in): stuck
                cur = src
                k += 1
                if 1 + depth[cur].max() <= D:
                    break
            nd = 1 + depth[cur].max()
            if nd <= D and k > 0:
                rebound += 1
                new_off = op - cur[0]
                added += copy_tag_size(length, new_off) - \
                    copy_tag_size(length, off)
                s = op - new_off
                off = new_off
                d = nd
            elif nd > D:
                if literalize:
                    added += 1 + length - (hdr)  # lit hdr ~1 + payload
                    depth[op: op + length] = 0
                    f[op: op + length] = np.arange(op, op + length)
                    op += length
                    continue
                residual += 1
        # apply (possibly rebound) copy
        kk = 0
        while kk < length:
            m = min(off, length - kk)
            depth[op + kk: op + kk + m] = depth[s + kk: s + kk + m] + 1
            f[op + kk: op + kk + m] = np.arange(s + kk, s + kk + m)
            kk += m
        op += length
    assert op == ulen, (op, ulen)
    return depth, added, residual, rebound


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tpu_snappy import api, format as fmt
    from tpu_snappy.ops import decode as ops_decode
    from tpu_snappy.utils import corpus

    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    data = corpus.load("all-mtg-cards.txt")[: nb * 65536]
    comp = api.compress(data, small_fastpath=False)
    total, start = fmt.varint_decode(comp)
    frags, clens, ulens = ops_decode.fragment_table(comp, start, total)
    print(f"{nb} mtg blocks, payload {len(comp)} B")

    # baseline depth profile
    base_max, base_p99 = [], []
    for i in range(len(ulens)):
        d, a, r, _ = study_block(frags[i, : clens[i]], int(ulens[i]),
                                 10 ** 9, False)
        base_max.append(int(d.max()))
        base_p99.append(int(np.percentile(d, 99)))
    print(f"baseline depth: max {max(base_max)} "
          f"(per-block {base_max}), p99 {max(base_p99)}")

    for policy in ("rebind", "literalize"):
        lit = policy == "literalize"
        print(f"\npolicy = {policy}")
        print(f"{'D':>4} {'added_B':>9} {'added_%':>8} {'resid':>6} "
              f"{'rebound':>8} {'max_d':>6} {'rounds':>7}")
        for D in (32, 16, 8, 4, 2):
            tot_added = tot_res = tot_reb = 0
            maxd = 0
            for i in range(len(ulens)):
                d, a, r, rb = study_block(frags[i, : clens[i]],
                                          int(ulens[i]), D, lit)
                tot_added += a
                tot_res += r
                tot_reb += rb
                maxd = max(maxd, int(d.max()))
            rounds = int(np.ceil(np.log2(max(1, maxd)))) if maxd > 1 else 0
            print(f"{D:>4} {tot_added:>9} {100 * tot_added / len(comp):>7.2f}%"
                  f" {tot_res:>6} {tot_reb:>8} {maxd:>6} {rounds:>7}")


if __name__ == "__main__":
    main()
