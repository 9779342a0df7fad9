"""Test configuration: force CPU with an 8-device virtual mesh.

Tests never require TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (the TLTestRAM/DummyPTW analogue of ScratchpadTest.scala —
fake the fabric, run the real logic).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
