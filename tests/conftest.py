"""Test harness: force an 8-device virtual CPU mesh.

Multi-device sharding is validated without TPU hardware by running JAX on
the host platform with 8 virtual devices — the TPU-native answer to
"test multi-core without a cluster" (SURVEY.md §4).

Note: this image's sitecustomize registers a TPU (axon) PJRT plugin at
interpreter start and forces ``jax_platforms`` via jax.config, so plain
``JAX_PLATFORMS=cpu`` env vars are ignored; the config must be updated
in-process before the first backend initialization. XLA_FLAGS is still
honored lazily because the CPU client initializes on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(autouse=True)
def _reset_registry_state():
    """Keep the dotted-key state store clean between tests."""
    from certifiedgpt_tpu.common.registry import registry

    saved = dict(registry.mapping["state"])
    yield
    registry.mapping["state"] = saved
