"""In-container training rig for the accuracy axis (VERDICT r4 next #1).

The container has zero egress, so no real checkpoint can be downloaded —
but the framework's PURPOSE (LongBench/needle/RULER accuracy of
compression methods vs FullKV, /root/reference/eval.py:99-110) can still
be exercised by TRAINING a small Llama-architecture model in-container
on synthetic long-context retrieval data and running the REAL harnesses
(`runners/run_needle.py`, `evalsuite` scoring) over the method x
capacity grid.

Pieces:
- :mod:`tokenizer` — closed-vocabulary word-level tokenizer with the HF
  surface the harnesses use (encode/decode/__call__/eos_token_id);
- :mod:`data` — synthetic haystack/needle/multikey generators (the
  needle generator doubles as the missing RULER-style data);
- :mod:`model` — full-sequence training forward over the SAME parameter
  pytree as ``models.llama.init_params`` (trained weights drop straight
  into the Engine);
- :mod:`loop` — Adam training loop + npz checkpointing.
"""

from .tokenizer import ToyTokenizer
from .data import SynthConfig, make_batch, write_haystack
from .model import forward_logits, loss_fn
from .loop import TrainConfig, train, save_checkpoint, load_checkpoint

__all__ = [
    "ToyTokenizer", "SynthConfig", "make_batch", "write_haystack",
    "forward_logits", "loss_fn", "TrainConfig", "train",
    "save_checkpoint", "load_checkpoint",
]
