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


# ---------------------------------------------------------------------------
# smoke tier: `pytest -m smoke` is the ~2-minute inner-loop slice — one or
# two representative tests per subsystem. The fast tier (`-m "not slow"`,
# ~11 min single-core) remains the pre-commit gate; slow is the full gate.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SMOKE_MODULES = {
    "test_cli.py",                   # every CLI parser + validation
    "test_packaging.py",             # console entry points resolve
    "test_bench_ledger.py",          # bench replay/ledger machinery
    "test_visualization_golden.py",  # artifact-layout goldens
}
_SMOKE_TESTS = {
    # one representative per subsystem (model fwd, ops parity, kernels,
    # data, trainer loop, attribution, distributed-sharding math)
    "test_models.py::test_ctclip_forward_and_loss",
    "test_models.py::test_ctclip_checkpoint_roundtrip",
    "test_ops.py::test_feedforward_parity",
    "test_ops.py::test_continuous_pos_bias_3d",
    "test_pallas.py::test_pallas_attention_matches_xla",
    "test_pallas.py::test_pallas_bert_layer_matches_xla",
    "test_data.py::test_nifti_roundtrip",
    "test_data.py::test_resize_trilinear_matches_torch",
    "test_trainer_driver.py::test_trainer_periodic_checkpoint",
    "test_attribution.py::test_rollout_volumes_shapes",
    "test_blockwise_attention.py::test_qrows_matches_dense",
    "test_ctgenerate.py::test_maskgit_forward",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.fspath.basename
        name = f"{base}::{item.originalname or item.name}"
        if base in _SMOKE_MODULES or name in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
