"""Request batching / scheduling on top of the engine.

The reference evaluates strictly at batch size 1 (``eval_batch_size=1``,
/root/reference/run_longbench.py:339; AdaKV/HeadKV even assert bsz == 1,
pyramidkv_utils.py:724) and lists batched inference as an open TODO
(README.md:47).  Here batching is first-class: requests are grouped by
prefill bucket, packed into fixed-width batch lanes (one compile per
(bucket, lane-width)), and decoded together with per-row EOS masking
already handled inside the engine's decode loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from .engine import Engine, GenerationOutput


@dataclass
class Request:
    request_id: str
    prompt_ids: "list[int]"
    max_new_tokens: Optional[int] = None
    eos_token_ids: Sequence[int] = ()


@dataclass
class CompletedRequest:
    request_id: str
    tokens: "list[int]"
    prefill_seconds: float
    decode_seconds: float


class BatchScheduler:
    """Greedy bucket-and-pack scheduler.

    Requests are queued, grouped by the prefill bucket their length maps to,
    and executed in lanes of exactly ``batch_size`` (short final groups are
    padded by repeating the last request so every (bucket, batch) shape
    compiles once and is reused).
    """

    def __init__(self, engine: Engine, batch_size: int = 1):
        assert batch_size >= 1
        self.engine = engine
        self.batch_size = batch_size
        self.queue: List[Request] = []

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def pending(self) -> int:
        return len(self.queue)

    def run(self) -> Dict[str, CompletedRequest]:
        es = self.engine.engine_spec
        groups: Dict[tuple, List[Request]] = {}
        for r in self.queue:
            bucket = es.bucket_for(len(r.prompt_ids))
            key = (bucket, r.max_new_tokens or es.max_new_tokens,
                   tuple(r.eos_token_ids))
            groups.setdefault(key, []).append(r)
        self.queue = []

        results: Dict[str, CompletedRequest] = {}
        for (bucket, max_new, eos), reqs in sorted(groups.items()):
            for i in range(0, len(reqs), self.batch_size):
                chunk = reqs[i : i + self.batch_size]
                lane = list(chunk)
                while len(lane) < self.batch_size:  # pad the last group
                    lane.append(chunk[-1])
                out: GenerationOutput = self.engine.generate(
                    [r.prompt_ids for r in lane],
                    max_new_tokens=max_new,
                    eos_token_ids=eos,
                )
                for j, r in enumerate(chunk):
                    results[r.request_id] = CompletedRequest(
                        request_id=r.request_id,
                        tokens=out.tokens[j],
                        prefill_seconds=out.prefill_seconds,
                        decode_seconds=out.decode_seconds,
                    )
        return results
