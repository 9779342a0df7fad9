"""Property-based round-trip fuzzing (hypothesis).

The CopyCompressSpec model (randomized cases, golden recomputed
independently) applied to the whole pipeline: arbitrary byte structures
must round-trip through the JAX codec with both independent golden
decoders agreeing, and our decoder must accept golden-encoded streams.
"""

import numpy as np
import pytest

try:
    from hypothesis import given, settings, strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

from tpu_snappy import api, reference_codec as ref
from tpu_snappy.native import golden

pytestmark = pytest.mark.skipif(not HAVE_HYP, reason="hypothesis not installed")


def structured_bytes():
    """Mixes of random runs, repeats, and back-references — the structures
    that exercise literals, RLE, near/far copies, and chain breaks."""
    segment = st.one_of(
        st.binary(min_size=1, max_size=60),
        # period-p repetition
        st.tuples(st.binary(min_size=1, max_size=12),
                  st.integers(1, 400)).map(lambda t: t[0] * t[1]),
        # printable text-ish
        st.text(alphabet="abcdefgh THEthe.,", min_size=1, max_size=200)
        .map(lambda s: s.encode()),
    )
    return st.lists(segment, min_size=0, max_size=12).map(b"".join)


@settings(max_examples=40, deadline=None)
@given(structured_bytes())
def test_roundtrip_fuzz(data):
    comp = api.compress(data)
    assert golden.uncompress(comp) == data
    assert ref.decompress(comp) == data
    assert api.decompress(comp) == data
    # and decode the independent encoder's stream
    assert api.decompress(golden.compress(data)) == data


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(100, 4000))
def test_roundtrip_random_seeds(seed, n):
    rng = np.random.default_rng(seed)
    # byte histogram skewed toward a small alphabet => dense matches
    alphabet = rng.integers(0, 256, 8, dtype=np.uint8)
    data = alphabet[rng.integers(0, 8, n)].tobytes()
    comp = api.compress(data)
    assert golden.uncompress(comp) == data
    assert len(comp) <= len(data) + 8
