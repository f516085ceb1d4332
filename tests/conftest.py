"""Test harness: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware, matching the driver's dryrun_multichip environment."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the axon TPU plugin default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the env var alone does not beat the axon plugin
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: identical HLO across tests (reactive replay,
# validate runner, eval fixtures share the tiny config) compiles once per
# machine instead of once per test; warm reruns of the suite start in seconds
from trafficbotsv15_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache(jax, prefix="jax_tb_tests")
