"""Native parameter checkpointing (orbax).

The reference has no checkpointing (inference-only, HF ``from_pretrained``
every run — SURVEY §5).  Converting an HF safetensors checkpoint to the
stacked layout takes minutes for 70B-class models; saving the converted
pytree once (orbax, sharding-aware) makes subsequent engine boots a single
mmap-speed restore — and is the natural home for sharded multi-host
restores.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def save_params(path: str, params: dict) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str, template: Optional[dict] = None,
                shardings: Optional[dict] = None) -> dict:
    """Restore a params pytree.  ``template`` (a pytree of ShapeDtypeStruct
    or arrays) enables sharded restore directly into device buffers."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is None:
        return ckptr.restore(path)
    target = jax.tree_util.tree_map(
        lambda x, s=None: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=None if shardings is None else s
        ),
        template,
    ) if shardings is None else jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        template, shardings,
    )
    return ckptr.restore(path, target)
