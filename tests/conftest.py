"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware; the driver
separately dry-runs the multichip path (see __graft_entry__.py) and the bench
runs on the real chip.

Note: pytest's plugin autoload imports jax before this file runs, so setting
JAX_PLATFORMS via os.environ is too late — but backends initialize lazily, so
jax.config.update still takes effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The serialized-executable store (engine/exec_store.py) is off in tests:
# a stored binary would survive in-process monkeypatching of compute fns
# and hide recompile-path behavior. test_exec_store.py opts in explicitly
# with a tmp-dir SONIC_EXEC_CACHE.
os.environ.setdefault("SONIC_EXEC_CACHE", "0")

pytest_plugins = ["aiohttp.pytest_plugin"]
