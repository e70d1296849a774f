"""Test harness config: force CPU with 8 virtual devices (for sharding tests).

The session environment registers the 'axon' TPU PJRT plugin via
sitecustomize and *overrides* JAX_PLATFORMS with jax.config.update, so the
env var alone is not enough — we must update the config again before any
backend initializes. XLA_FLAGS must also be set before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Set the ENV VAR, not just jax.config: utils.respect_env_platforms() (called
# by enable_compilation_cache below and by every CLI entry point a test may
# exercise) re-asserts JAX_PLATFORMS from the environment — with the session's
# JAX_PLATFORMS=axon still set, tests would silently reacquire the shared TPU
# and wedge against whatever job owns it (the round-3 starved-pytest bug).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persist XLA executables across test runs: the unrolled HAC graphs dominate
# suite wall-clock and recompile identically every run otherwise.
from hint_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
