"""Test harness config: force a deterministic 8-device CPU mesh so sharding
tests run without TPU hardware (the axon TPU plugin otherwise overrides
JAX_PLATFORMS, and every compile would go through the device tunnel)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Default the engine to the single-device fused path so legacy tests pin it;
# distributed tests opt into the mesh explicitly via run_pipeline(n_devices=N).
os.environ.setdefault("KRISP_TPU_DEVICES", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
