"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY §4): distributed behavior is
exercised on one box. Here an 8-device CPU platform stands in for a TPU slice;
sharding/pjit semantics are identical, only performance differs.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
