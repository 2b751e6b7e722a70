"""Test config: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the fake-backend story the
reference lacks entirely — it was only ever run on a live NCCL cluster,
SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force-override (env may pin a TPU plugin)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize may have already imported jax and pinned the platform via
# jax.config; the config update wins over os.environ, so set it explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
