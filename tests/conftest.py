"""Test configuration: force CPU with an 8-device virtual mesh.

Tests never require TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (the TLTestRAM/DummyPTW analogue of ScratchpadTest.scala —
fake the fabric, run the real logic).

Note: this image's sitecustomize registers the `axon` TPU-tunnel PJRT
backend and rewrites jax_platforms at interpreter start, so setting the
JAX_PLATFORMS env var is NOT enough — we must override the jax config after
import, before any backend initializes. Otherwise "CPU" tests silently
compile through the TPU tunnel (~100x slower).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite accumulates hundreds of distinct XLA:CPU executables in
    one process; past some threshold a later compile reproducibly
    segfaults inside backend_compile (observed three runs in a row at the
    same test, which passes in isolation and in any smaller combination —
    an upstream XLA:CPU resource/codegen issue, not a codec bug). Dropping
    the jit caches per module keeps the live-executable count bounded; the
    cost is re-compiling shared graphs (~+20% suite time)."""
    yield
    import jax
    jax.clear_caches()
