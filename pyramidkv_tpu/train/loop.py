"""Adam training loop + npz checkpointing for the tiny retrieval model.

Single-chip by design (the model is ~8M params; one TPU core trains it
in minutes) but the step is jitted with donated state so it also runs
on the CPU backend for tests.  Checkpoints are plain npz pytrees the
Engine consumes directly (`load_checkpoint` returns the same structure
as `models.llama.init_params`).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelSpec
from .data import SynthConfig, make_batch
from .model import loss_fn
from .tokenizer import ToyTokenizer


def tiny_retrieval_spec(vocab_size: int, max_pos: int = 4096) -> ModelSpec:
    """The rig's model geometry: Llama architecture in miniature with
    GQA (8q/4kv) so compression's grouped-selection path is exercised."""
    return ModelSpec(
        name="tiny-retrieval", vocab_size=vocab_size, hidden_size=256,
        intermediate_size=1024, num_hidden_layers=8,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        rope_theta=10000.0, max_position_embeddings=max_pos,
        tie_word_embeddings=True,
    )


@dataclass
class TrainConfig:
    steps: int = 3000
    lr: float = 3e-4
    warmup: int = 100
    weight_decay: float = 0.01
    seed: int = 0
    log_every: int = 50
    synth: SynthConfig = field(default_factory=SynthConfig)


def train(spec: ModelSpec, cfg: TrainConfig,
          tok: Optional[ToyTokenizer] = None,
          params: Optional[dict] = None,
          on_log: Optional[Callable] = None) -> "tuple[dict, list]":
    """Returns (trained f32 params, loss history [(step, loss), ...])."""
    import optax

    from ..models.llama import init_params

    tok = tok or ToyTokenizer()
    assert spec.vocab_size >= len(tok), (spec.vocab_size, len(tok))
    if params is None:
        params = init_params(spec, jax.random.PRNGKey(cfg.seed),
                             dtype=jnp.float32)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, cfg.warmup, max(cfg.steps, cfg.warmup + 1))
    opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, tokens, weights):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, spec, tokens, weights)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = np.random.default_rng(cfg.seed + 1)
    history = []
    t0 = time.perf_counter()
    for step in range(cfg.steps):
        tokens, weights = make_batch(rng, tok, cfg.synth)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(tokens), jnp.asarray(weights))
        if step % cfg.log_every == 0 or step == cfg.steps - 1:
            lv = float(loss)
            history.append((step, lv))
            msg = (f"[train] step {step}/{cfg.steps} loss {lv:.4f} "
                   f"({time.perf_counter() - t0:.1f}s)")
            (on_log or print)(msg)
    return params, history


def save_checkpoint(path: str, params: dict, spec: ModelSpec,
                    dtype=np.float32) -> None:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    payload = {"spec": json.dumps({
        k: getattr(spec, k) for k in (
            "name", "vocab_size", "hidden_size", "intermediate_size",
            "num_hidden_layers", "num_attention_heads",
            "num_key_value_heads", "head_dim", "rope_theta",
            "max_position_embeddings", "tie_word_embeddings")})}
    for kp, leaf in leaves:
        key = "/".join(str(getattr(p, "key", p)) for p in kp)
        payload[f"arr_{key}"] = np.asarray(leaf, dtype)
    np.savez_compressed(path, **payload)


def load_checkpoint(path: str, dtype=jnp.float32
                    ) -> "tuple[dict, ModelSpec]":
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["spec"]))
    spec = ModelSpec(**meta)
    params: dict = {}
    for name in z.files:
        if not name.startswith("arr_"):
            continue
        parts = name[4:].split("/")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(z[name], dtype)
    return params, spec
