"""Force tests onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware; the driver separately
dry-runs the multi-chip path via ``__graft_entry__.dryrun_multichip``.

NOTE: this image's ``sitecustomize`` (axon) pre-imports jax and pins
``JAX_PLATFORMS=axon`` (TPU-via-tunnel, minutes-per-compile), so plain
``os.environ.setdefault`` is not enough — we must override the already-
initialised jax config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize pre-set it
jax.config.update("jax_enable_x64", False)
assert jax.devices()[0].platform == "cpu"
