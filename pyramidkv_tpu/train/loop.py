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
    #: steps fused into ONE jitted `lax.scan` call: over the axon tunnel
    #: every dispatch pays a round-trip, so single-step training ran at
    #: ~0.44 s/step and a hung RPC stranded 900 steps of progress
    #: (logs/tpu_r5f.log) — scan chunks amortise the tunnel 25x and give
    #: natural checkpoint boundaries
    scan_steps: int = 25
    synth: SynthConfig = field(default_factory=SynthConfig)


def train(spec: ModelSpec, cfg: TrainConfig,
          tok: Optional[ToyTokenizer] = None,
          params: Optional[dict] = None,
          on_log: Optional[Callable] = None,
          save_cb: Optional[Callable] = None,
          start_step: int = 0) -> "tuple[dict, list]":
    """Returns (trained f32 params, loss history [(step, loss), ...]).

    ``save_cb(step, params)`` fires after every scan chunk (resumable
    training: pass ``start_step`` + the loaded params to continue).
    A resumed segment draws its data from a FRESH seed derived from
    (seed, start_step): the stream is i.i.d., so segment identity is
    deterministic per (seed, resume point) without replaying the
    skipped draws host-side (a 26k-step replay cost ~40 min of pure
    data generation — logs/tpu_r5f_run.log).  Optimizer state and the
    LR schedule restart, an accepted approximation for the rig."""
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
    K = max(1, min(cfg.scan_steps, cfg.steps))

    @jax.jit
    def multi_step(params, opt_state, toks, ws):
        def body(carry, xw):
            p, s = carry
            t, w = xw
            loss, grads = jax.value_and_grad(loss_fn)(p, spec, t, w)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (toks, ws))
        return params, opt_state, losses

    rng = np.random.default_rng(cfg.seed + 1 + 7919 * start_step)
    history = []
    t0 = time.perf_counter()
    step = (start_step // K) * K
    while step < cfg.steps:
        k = min(K, cfg.steps - step)
        bt = np.zeros((k, cfg.synth.batch, cfg.synth.seq_len), np.int32)
        bw = np.zeros((k, cfg.synth.batch, cfg.synth.seq_len), np.float32)
        for i in range(k):
            bt[i], bw[i] = make_batch(rng, tok, cfg.synth)
        params, opt_state, losses = multi_step(
            params, opt_state, jnp.asarray(bt), jnp.asarray(bw))
        step += k
        if (step // K) % max(cfg.log_every // K, 1) == 0 or step >= cfg.steps:
            lv = float(losses[-1])
            history.append((step, lv))
            msg = (f"[train] step {step}/{cfg.steps} loss {lv:.4f} "
                   f"({time.perf_counter() - t0:.1f}s)")
            (on_log or print)(msg)
        if save_cb is not None:
            save_cb(step, params)
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
