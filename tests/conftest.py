"""Test configuration: force an 8-device virtual CPU mesh so every sharding
code path (pjit / shard_map over the `data` axis) is exercised without TPU
hardware, mirroring the multi-chip design described in SURVEY.md §2.7/§7.
"""
import os

# Force CPU: the ambient environment exports JAX_PLATFORMS=axon (tunneled
# TPU), which is both slow per-dispatch and single-device — tests need the
# 8-device virtual CPU mesh. The axon sitecustomize imports jax at interpreter
# start, so the env var alone is too late; update jax.config directly (before
# any backend is instantiated).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Never touch the network (transformers is used only for local golden tests).
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
# oneDNN fast-math can silently run f32 matmuls in bf16 on AMX CPUs.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs[:8]
