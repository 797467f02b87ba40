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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices timeshare the host cores: under load, CPU-collective
# rendezvous can exceed the default 40 s TERMINATION threshold and abort
# the whole pytest process (observed on a 4-core host).
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize pre-set it
jax.config.update("jax_enable_x64", False)
assert jax.devices()[0].platform == "cpu"
