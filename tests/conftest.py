"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware; the
driver separately dry-runs `__graft_entry__.dryrun_multichip`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
