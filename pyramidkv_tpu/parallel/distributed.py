"""Multi-host initialisation + mesh construction.

The reference has no distributed runtime at all (SURVEY.md §2.7: its
multi-GPU story is `device_map="auto"` layer placement).  The TPU-native
story: every host runs the same SPMD program; `jax.distributed.initialize`
forms the process group, the mesh spans all chips, XLA routes collectives
over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from .mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent `jax.distributed.initialize` (env-driven on TPU pods —
    all args auto-detected from the TPU metadata there)."""
    if jax.process_count() > 1:
        return  # already initialised
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # single-process run (no coordinator configured) — fine.
        pass


def auto_mesh(
    data_parallel: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
):
    """Mesh over ALL global devices: `data` across hosts/slices (DCN-friendly
    batch parallelism), `model` within a slice (ICI tensor parallelism).

    Default: data = number of processes (hosts), model = chips per host —
    the layout where every collective on the model axis stays on ICI.
    """
    n = len(jax.devices())
    dp = data_parallel if data_parallel is not None else max(jax.process_count(), 1)
    assert n % dp == 0, (n, dp)
    return make_mesh((dp, n // dp), axis_names)
