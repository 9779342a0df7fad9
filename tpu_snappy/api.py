"""Host-facing codec API: bytes in, bytes out.

This is the role of the reference's C driver API (`compress(src, dst)` /
`uncompress`, tests/compression.c:20-39) — set up the job, invoke the
accelerator, collect the variable-length result — except the "accelerator"
is a jitted JAX pipeline and multi-block jobs are batched device-wide.
"""

from __future__ import annotations

import numpy as np

from . import format as fmt
from .config import CodecConfig, DEFAULT_CONFIG
from .ops import encode as ops_encode
from .ops import decode as ops_decode


def _to_blocks(data: bytes, block_size: int):
    """Split + zero-pad input into (B, 65536) blocks with a length vector."""
    n = len(data)
    nblocks = max(1, -(-n // block_size))
    arr = np.zeros((nblocks, fmt.BLOCK_SIZE), dtype=np.uint8)
    flat = np.frombuffer(data, dtype=np.uint8)
    for i in range(nblocks):
        chunk = flat[i * block_size:(i + 1) * block_size]
        arr[i, :len(chunk)] = chunk
    lengths = np.minimum(
        np.maximum(n - np.arange(nblocks) * block_size, 0), block_size
    ).astype(np.int32)
    return arr, lengths


#: Blocks/fragments per vmapped wave for multi-block API calls. Jitting a
#: vmap over ALL blocks compiles a graph proportional to the input size
#: (a 48-block graph can exceed 10 min of XLA compile on a remote backend);
#: lax.map over fixed 8-wide waves bounds compile cost at one wave for any
#: input size, at ~8% device cost vs the 24-wide corpus sweet spot.
API_WAVE = 8


def compress(data: bytes, cfg: CodecConfig = DEFAULT_CONFIG) -> bytes:
    """Compress to a standard Snappy stream (varint preamble + elements)."""
    blocks, lengths = _to_blocks(data, cfg.block_size)
    nb = len(lengths)
    if nb > API_WAVE:
        pad = -nb % API_WAVE
        if pad:
            blocks = np.pad(blocks, ((0, pad), (0, 0)))
            lengths = np.pad(lengths, (0, pad))
        out, out_lens = ops_encode.encode_corpus(blocks, lengths, cfg,
                                                 wave=API_WAVE)
    else:
        out, out_lens = ops_encode.encode_blocks(blocks, lengths, cfg)
    out = np.asarray(out)
    out_lens = np.asarray(out_lens)
    parts = [fmt.varint_encode(len(data))]
    for i in range(nb):
        parts.append(out[i, : out_lens[i]].tobytes())
    return b"".join(parts)


def decompress(comp: bytes, cfg: CodecConfig = DEFAULT_CONFIG) -> bytes:
    """Decompress a standard Snappy stream (ours or any other encoder's).

    Fragment-parallel on device; valid-but-exotic streams that defeat
    fragment-local decoding fall back to the sequential host decoder."""
    total, start = fmt.varint_decode(comp)
    if total == 0:
        if len(comp) != start:
            raise ValueError("trailing bytes after empty stream")
        return b""
    try:
        frags, fstarts, fulens = ops_decode.fragment_table(comp, start, total)
    except ops_decode.FragmentFallback:
        from . import reference_codec
        return reference_codec.decompress(comp)
    nf = len(fulens)
    if nf > API_WAVE:
        # Bounded-compile wave batching (see compress/API_WAVE).
        w = ops_decode.frag_width(np.asarray(fstarts))
        pad = -nf % API_WAVE
        fr = np.pad(np.asarray(frags)[:, :w], ((0, pad), (0, 0)))
        cl = np.pad(np.asarray(fstarts, np.int32), (0, pad))
        ul = np.pad(np.asarray(fulens, np.int32), (0, pad))
        out, ok = ops_decode.decode_corpus(fr, cl, ul, wave=API_WAVE)
        out, ok = out[:nf], ok[:nf]
    else:
        out, ok = ops_decode.decode_fragments(frags, fstarts, fulens, cfg)
    ok = np.asarray(ok)
    if not ok.all():
        # Either corrupt, or valid-but-exotic (e.g. copies reaching across
        # the 64 KB fragment boundary, which no known encoder emits but the
        # format permits). The sequential decoder settles it: it decodes the
        # exotic case and raises a precise error for the corrupt one.
        from . import reference_codec
        try:
            return reference_codec.decompress(comp)
        except ValueError as host_err:
            bad = np.nonzero(~ok)[0]
            raise ValueError(
                f"invalid Snappy stream: fragment(s) {bad[:8].tolist()} of "
                f"{len(ok)} failed validation ({host_err})") from host_err
    out = np.asarray(out)
    parts = []
    for i in range(len(fulens)):
        parts.append(out[i, : fulens[i]].tobytes())
    result = b"".join(parts)
    if len(result) != total:
        raise ValueError("length mismatch vs preamble")
    return result
