"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Env vars must be set before the first ``import jax`` computation so
sharding/collective tests exercise multi-device code paths without TPU
hardware. Additionally, this environment registers an ``axon`` TPU PJRT
plugin at interpreter start whose initialization dials a remote relay and
can block for minutes; JAX initializes every registered plugin at first use
even when ``JAX_PLATFORMS=cpu``, so we deregister the factory before any
backend is instantiated.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:  # drop the axon TPU plugin factory so CPU tests never touch the tunnel
    from jax._src import xla_bridge as _xb  # noqa: E402

    _xb._backend_factories.pop("axon", None)
except Exception:  # pragma: no cover - plugin layout may change
    pass

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
