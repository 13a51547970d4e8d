"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware; the
driver separately dry-runs `__graft_entry__.dryrun_multichip`.

The environment's TPU plugin force-selects its own platform at import, so a
plain JAX_PLATFORMS env var is not enough — we must update jax.config before
any backend initializes (pytest imports conftest first, so this is safe).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
