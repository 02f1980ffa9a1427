"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing XLA's host
platform to expose 8 devices (the TPU-native analog of "test multi-node
without a cluster").

Note: in the axon TPU environment, a sitecustomize preloads jax at
interpreter startup, so setting ``JAX_PLATFORMS`` here is too late. The CPU
backend, however, initializes lazily — appending the device-count flag to
``XLA_FLAGS`` and switching the default platform via
``jax.config.update("jax_platform_name", "cpu")`` still works as long as no
CPU computation has run yet.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # effective when jax not preloaded
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Restrict backend initialization to cpu BEFORE the first jax.devices()
# call: with the env-pinned JAX_PLATFORMS=axon, backends() would otherwise
# also initialize the remote TPU relay — and a down/unreachable relay then
# fails the entire CPU suite at conftest import. Backends init lazily, so a
# runtime config update still works even though jax itself was preloaded.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
