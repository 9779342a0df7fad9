"""Multi-device DP sharding tests on the virtual 8-device CPU mesh
(the ScratchpadTest fake-SoC analogue: real logic, fake fabric)."""

import io

import jax
import numpy as np
import pytest

from tpu_snappy import format as fmt
from tpu_snappy.native import golden
from tpu_snappy.parallel import mesh as meshlib, shard, streaming
from tpu_snappy.utils import corpus


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return meshlib.make_mesh(8)


def test_mesh_shape(mesh8):
    assert mesh8.devices.size == 8
    assert mesh8.axis_names == ("dp",)


def test_encode_dp_matches_single_device(mesh8):
    data = corpus.load("all-mtg-cards.txt")[: 10 * fmt.BLOCK_SIZE + 1234]
    comp = shard.encode_dp(data, mesh8)
    assert golden.uncompress(comp) == data
    # Sharded run must produce the identical stream to the 1-device run
    # (per-block determinism — manifests just reorder the same bytes).
    mesh1 = meshlib.make_mesh(1)
    assert comp == shard.encode_dp(data, mesh1)


def test_decode_dp_roundtrip(mesh8):
    data = corpus.load("all-mtg-cards.txt")[: 9 * fmt.BLOCK_SIZE + 77]
    comp = shard.encode_dp(data, mesh8)
    assert shard.decode_dp(comp, mesh8) == data
    # Cross: decode a C++-golden stream sharded.
    assert shard.decode_dp(golden.compress(data), mesh8) == data


def test_encode_dp_small_input(mesh8):
    # Fewer blocks than devices: padding blocks must vanish from the output.
    data = b"hello hello hello hello " * 10
    comp = shard.encode_dp(data, mesh8)
    assert golden.uncompress(comp) == data


def test_streaming_compress(mesh8):
    data = corpus.load("all-mtg-cards.txt")[: 20 * fmt.BLOCK_SIZE + 5]
    src, dst = io.BytesIO(data), io.BytesIO()
    stats = streaming.compress_stream(src, dst, len(data), mesh8,
                                      blocks_per_wave=8)
    comp = dst.getvalue()
    assert stats.in_bytes == len(data)
    assert stats.out_bytes == len(comp)
    assert stats.waves == 3  # 20.0001 blocks in waves of 8
    assert golden.uncompress(comp) == data
    # Stream output identical to one-shot output (wave boundaries invisible).
    assert comp == shard.encode_dp(data, mesh8)
