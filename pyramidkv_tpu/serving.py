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

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

from .engine import Engine, GenerationOutput


@dataclass
class Request:
    request_id: str
    prompt_ids: "list[int]"
    max_new_tokens: Optional[int] = None
    eos_token_ids: Sequence[int] = ()
    #: seconds after ``run()`` starts at which this request becomes
    #: visible to the scheduler (open-loop arrival process; 0.0 = present
    #: at start, the historical batch-arrival behavior).
    arrival_time: float = 0.0
    #: shared-prompt prefix caching (``Engine.precompute_prefix``):
    #: requests carrying the SAME handle are grouped into one refill and
    #: resume their chunked prefill past the cached span.  Ignored on
    #: non-chunked refills (full prefill — identical output).
    prefix: "Optional[object]" = None


@dataclass
class CompletedRequest:
    request_id: str
    tokens: "list[int]"
    prefill_seconds: float
    decode_seconds: float
    #: arrival offset the request carried (echoed for reporting)
    arrival_time: float = 0.0
    #: time-to-first-token: arrival -> first token available (includes
    #: queue wait + prefill; the serving-latency headline metric)
    ttft_seconds: float = 0.0
    #: arrival -> last token (end-to-end request latency)
    e2e_seconds: float = 0.0


def poisson_workload(n: int, rate: float, prompt_lens: Sequence[int],
                     seed: int = 0, vocab: int = 32000,
                     max_new_tokens: Optional[int] = None) -> "list[Request]":
    """Open-loop Poisson arrival workload: ``n`` requests at ``rate``
    req/s (exponential inter-arrival gaps), prompt lengths cycled from
    ``prompt_lens`` and shuffled — the standard serving-benchmark shape
    (mixed lengths + random arrivals) rather than the batch-arrival
    best case."""
    import numpy as np

    rng = np.random.default_rng(seed)
    gaps = rng.exponential(1.0 / rate, size=n) if rate > 0 else [0.0] * n
    arrivals = np.cumsum(gaps)
    lens = [prompt_lens[i % len(prompt_lens)] for i in range(n)]
    rng.shuffle(lens)
    return [
        Request(
            request_id=f"r{i}",
            prompt_ids=[int(t) for t in rng.integers(0, vocab, size=lens[i])],
            arrival_time=float(arrivals[i]),
            max_new_tokens=max_new_tokens,
        )
        for i in range(n)
    ]


def latency_summary(results: "Dict[str, CompletedRequest]") -> dict:
    """p50/p90/p99 TTFT and end-to-end latency + token totals over a
    completed serving run (the CompletedRequest fields filled by
    ``ContinuousBatcher.run``)."""
    import numpy as np

    rs = list(results.values())
    if not rs:
        return {}
    ttft = np.asarray([r.ttft_seconds for r in rs])
    e2e = np.asarray([r.e2e_seconds for r in rs])

    def pct(a):
        return {p: round(float(np.percentile(a, p)), 4)
                for p in (50, 90, 99)}

    return {
        "requests": len(rs),
        "total_tokens": int(sum(len(r.tokens) for r in rs)),
        "ttft_s": pct(ttft),
        "e2e_s": pct(e2e),
        "mean_ttft_s": round(float(ttft.mean()), 4),
        "mean_e2e_s": round(float(e2e.mean()), 4),
    }


class ContinuousBatcher:
    """Continuous batching with lane recycling.

    A fixed number of decode LANES share one batched cache.  When a lane
    finishes (EOS or budget), the next queued request is prefilled (at its
    own bucket) and its compressed cache is written into the free lane —
    possible because every compression method's compacted cache has the
    SAME static shape regardless of prompt bucket (width + window + decode
    slots), unlike full-KV.  Decode runs in fixed quanta of ``quantum``
    steps between refills; per-lane step counts drive per-row slot writes
    (`models.llama.decode_step(lane_steps=...)`).
    """

    def __init__(self, engine: Engine, lanes: int = 4, quantum: int = 16,
                 mesh=None, refill_tokens: int = 8192,
                 chunked_refill_tokens: int = 32768,
                 on_tokens=None, prefix_registry=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis —
        decode LANES shard across it (multi-chip/multi-host data-parallel
        serving; each device advances its lanes, no cross-device traffic in
        the quantum).  ``lanes`` must divide by the data-axis size.

        ``refill_tokens`` bounds the batched-refill prefill: group rows <=
        refill_tokens // bucket (power of two), so short-context refills
        batch (2k -> 4 rows at the default) while long-context refills
        stay sequential — batched 32k x 4 prefill transients OOM next to
        the lane cache + weights at full depth (logs/tpu_r2am)."""
        import jax

        self.engine = engine
        self.lanes = lanes
        self.quantum = quantum
        self.mesh = mesh
        self.refill_tokens = refill_tokens
        #: HBM guard for CHUNKED refills: each in-flight chunked refill
        #: carries a bucket-length full-KV state (4.3 GB at 32k d32), so
        #: at most ``chunked_refill_tokens`` worth of rows x bucket may be
        #: resumable at once (4 concurrent 32k states measured
        #: RESOURCE_EXHAUSTED next to 4.5 GB of weights — logs/tpu_r3g)
        self.chunked_refill_tokens = chunked_refill_tokens
        #: streaming callback ``on_tokens(request_id, new_token_ids)`` —
        #: invoked with each request's first token at lane insert and with
        #: every quantum's newly emitted tokens (token-level streaming for
        #: serving frontends; EOS/stop tokens are excluded, same as the
        #: final ``CompletedRequest.tokens``)
        self.on_tokens = on_tokens
        #: optional ``engine.PrefixRegistry``: requests without an explicit
        #: handle get the LONGEST registered prefix their prompt starts
        #: with attached automatically at ``run()`` entry
        self.prefix_registry = prefix_registry
        if mesh is not None:
            assert lanes % mesh.shape["data"] == 0, (
                lanes, dict(mesh.shape))
        es = engine.engine_spec
        # lane-uniform cache shapes require bucket-independent prefill slots
        plans = [engine.plan_for(b) for b in es.prefill_buckets]
        slots = {p.prefill_slots for p in plans}
        if len(slots) != 1:
            raise ValueError(
                "ContinuousBatcher needs a compression method whose compacted "
                f"cache is bucket-independent; got prefill_slots={slots}. "
                "(fullkv/minference caches grow with the bucket — use "
                "BatchScheduler for those.)"
            )
        self._plan = plans[0]
        self._quantum_fn = None
        # speculative lanes: every lane drafts (on-device prompt-lookup)
        # and verifies spec_draft_len tokens per forward — per-lane
        # acceptance rides the lane_steps machinery
        self._spec_mode = (
            es.speculative == "ngram" and es.greedy
            and self._plan.spec.quant_method is None
            and not self._plan.think_narrow
        )
        if self._spec_mode and lanes > es.spec_max_lanes:
            # measured crossover (BASELINE r2as/r2at): verify forwards over
            # lanes x (k+1) rows leave the weight-bandwidth-bound regime
            # past ~32-40 rows — -4% at 8 lanes, -34% at 16, vs +14% at 4.
            # Auto-disable instead of silently serving slower.
            import warnings

            warnings.warn(
                f"ContinuousBatcher: disabling ngram speculation at "
                f"{lanes} lanes (> spec_max_lanes={es.spec_max_lanes}; "
                f"measured net-negative above the crossover — see "
                f"BASELINE.md r2as/r2at). Raise EngineSpec.spec_max_lanes "
                f"to force it.",
                stacklevel=2,
            )
            self._spec_mode = False
        #: history layout: every lane's prompt is right-aligned at
        #: ``hoff`` (the largest bucket), generated tokens append from
        #: ``hoff`` — one uniform generation offset for mixed buckets.
        self._hoff = max(es.prefill_buckets)
        self._hlen = self._hoff + es.max_new_tokens + es.spec_draft_len + 1

    def _build_quantum(self):
        import jax
        import jax.numpy as jnp

        from .models import llama

        engine = self.engine
        plan = self._plan
        spec = engine.model_spec
        q_steps = self.quantum

        # donate the cache + lane state: without donation XLA copies the
        # full batched cache (GBs at 32-layer scale) on EVERY quantum
        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
        def quantum_fn(params, cache, tokens, lane_steps, done, budget, eos_ids):
            def step_fn(carry, _):
                cache, tokens, lane_steps, done = carry
                logits, cache = llama.decode_step(
                    params, spec, plan, cache, tokens, lane_steps=lane_steps
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                is_eos = jnp.any(nxt[:, None] == eos_ids[None, :], axis=-1)
                nxt = jnp.where(done, tokens, nxt)
                emitted = jnp.where(done, -1, nxt)
                lane_steps = jnp.where(done, lane_steps, lane_steps + 1)
                done = done | is_eos | (lane_steps >= budget)
                return (cache, nxt, lane_steps, done), emitted

            (cache, tokens, lane_steps, done), outs = jax.lax.scan(
                step_fn, (cache, tokens, lane_steps, done), None, length=q_steps
            )
            return cache, tokens, lane_steps, done, outs.T  # [B, Q]

        return quantum_fn

    def _build_quantum_spec(self):
        """Speculative quantum: ``quantum`` verify iterations, each lane
        emitting 1..k+1 greedy-exact tokens per iteration (accepted
        prompt-lookup drafts).  Emits ``[B, Q*(k+1)]`` with -1 padding
        inside each iteration's (k+1)-chunk."""
        import jax
        import jax.numpy as jnp

        from .models import llama
        from .ops.ngram import ngram_draft

        engine = self.engine
        plan = self._plan
        spec = engine.model_spec
        es = engine.engine_spec
        n, k = es.spec_ngram, es.spec_draft_len
        q_iters = self.quantum

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 7, 9))
        def quantum_fn(params, cache, tokens, lane_steps, done, budget,
                       eos_ids, hist, hstart, hend):
            b = tokens.shape[0]
            rows = jnp.arange(b)[:, None]
            tpos = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
            hl = hist.shape[1]

            def iter_fn(carry, _):
                cache, tokens, lane_steps, done, hist, hend = carry
                draft, nd = ngram_draft(hist, hstart, hend, n=n, k=k)
                tok_in = jnp.concatenate([tokens[:, None], draft], axis=1)
                logits, cache = llama.verify_step(
                    params, spec, plan, cache, tok_in,
                    lane_steps=lane_steps)
                gt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                ok = (draft == gt[:, :-1]) & (tpos[:, :k] < nd[:, None])
                a = jnp.cumprod(ok.astype(jnp.int32), axis=1).sum(axis=1)
                e = jnp.maximum(jnp.minimum(a + 1, budget - lane_steps), 0)
                e = jnp.where(done, 0, e)
                emit = tpos < e[:, None]
                is_eos = jnp.any(
                    gt[:, :, None] == eos_ids[None, None, :], axis=-1
                ) & emit
                eos_pos = jnp.min(jnp.where(is_eos, tpos, k + 1), axis=1)
                e = jnp.minimum(e, eos_pos + 1)
                emit = tpos < e[:, None]
                emitted = jnp.where(emit, gt, -1)
                lane_steps = lane_steps + e
                done = done | (eos_pos <= k) | (lane_steps >= budget)
                import os as _os
                if _os.environ.get("PKV_SPEC_NO_ROLLBACK") != "1":  # ablation
                    cache = llama.rollback_decode(cache, plan, lane_steps)
                hcols = jnp.where(emit, hend[:, None] + tpos, hl)
                hist = hist.at[rows, hcols].set(gt, mode="drop")
                hend = hend + e
                nxt = jnp.take_along_axis(
                    gt, jnp.clip(e - 1, 0, k)[:, None], axis=1)[:, 0]
                tokens = jnp.where(e > 0, nxt, tokens)
                return (cache, tokens, lane_steps, done, hist, hend), emitted

            (cache, tokens, lane_steps, done, hist, hend), outs = \
                jax.lax.scan(
                    iter_fn,
                    (cache, tokens, lane_steps, done, hist, hend),
                    None, length=q_iters)
            em = outs.transpose(1, 0, 2).reshape(b, q_iters * (k + 1))
            return cache, tokens, lane_steps, done, hist, hend, em

        return quantum_fn

    def run(self, requests: "list[Request]") -> Dict[str, CompletedRequest]:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from .cache import KVCache

        engine = self.engine
        es = engine.engine_spec
        plan = self._plan
        queue = list(requests)
        if not queue:
            return {}
        # Registry auto-match resolves into a LOCAL map for this run (not
        # onto the caller-owned Request objects — a Request reused later
        # would keep a stale handle; ADVICE r4).
        auto_prefix: "dict[int, object]" = {}
        if self.prefix_registry is not None:
            for r in queue:
                if r.prefix is None:
                    m = self.prefix_registry.match(r.prompt_ids)
                    if m is not None:
                        auto_prefix[id(r)] = m

        def rpfx(r):
            return r.prefix if r.prefix is not None else auto_prefix.get(id(r))

        if self._quantum_fn is None:
            self._quantum_fn = (self._build_quantum_spec() if self._spec_mode
                                else self._build_quantum())

        spec = engine.model_spec
        heads = (
            spec.num_key_value_heads
            if plan.spec.gqa_aggregate
            else spec.num_attention_heads
        )
        L, B, S, D = (
            spec.num_hidden_layers, self.lanes, plan.total_slots, spec.head_dim,
        )
        from .models.weights import weight_dtype

        dtype = weight_dtype(engine.params)  # QuantW embed -> bf16
        quantized = plan.spec.quant_method is not None
        if plan.segmented:
            # per-segment slot widths depend on the bucket; one bucket only
            assert len(es.prefill_buckets) == 1, (
                "segmented plans (l2norm skip_layers / pyramidkv) support "
                "continuous batching with a single prefill bucket"
            )
        if quantized or plan.segmented or plan.think_narrow:
            # derive the batched cache structure (incl. quant/think region /
            # per-segment shapes) from an abstract prefill at the smallest
            # bucket
            bucket0 = es.prefill_buckets[0]
            # the template must match the path refills take (chunked
            # finish vs monolithic differ under q_layout='pa')
            _, cache_shape = engine.prefill_cache_shape(bucket0)
            def _mk(leaf):
                shp = list(leaf.shape)
                if len(shp) >= 2:
                    shp[1] = B  # batch axis of [L, B, ...] leaves
                return jnp.zeros(tuple(shp), leaf.dtype)
            cache = jax.tree_util.tree_map(_mk, cache_shape)
            cache = cache._replace(
                true_len=jnp.zeros((B,), jnp.int32),
                step=jnp.zeros((), jnp.int32),
            )
        else:
            cache = KVCache(
                k=jnp.zeros((L, B, heads, S, D), dtype),
                v=jnp.zeros((L, B, heads, S, D), dtype),
                mask=jnp.zeros((L, B, heads, S), bool),
                positions=jnp.full((L, B, heads, S), -1, jnp.int32),
                true_len=jnp.zeros((B,), jnp.int32),
                step=jnp.zeros((), jnp.int32),
            )
        if self.mesh is not None:
            # shard the LANE axis over `data` (DP serving) and, when the
            # mesh carries a model axis, the HEAD axis over `model` —
            # cache leaves are [L, B, H, ...], so TP-sharded params and the
            # cache line up with no resharding inside the decode quantum
            # (the multi-host topology: TP over ICI within a host, DP
            # lanes over hosts).
            from jax.sharding import NamedSharding, PartitionSpec as P

            lane_sh = NamedSharding(self.mesh, P("data"))
            tp = dict(self.mesh.shape).get("model", 1)

            def _sh(x):
                nd = getattr(x, "ndim", 0)
                if nd >= 3 and tp > 1 and x.shape[2] % tp == 0:
                    return jax.device_put(
                        x, NamedSharding(self.mesh, P(None, "data", "model")))
                if nd >= 2:
                    return jax.device_put(
                        x, NamedSharding(self.mesh, P(None, "data")))
                return x

            cache = jax.tree_util.tree_map(_sh, cache)
            cache = cache._replace(
                true_len=jax.device_put(cache.true_len, lane_sh)
            )
        tokens = jnp.zeros((B,), jnp.int32)
        lane_steps = jnp.zeros((B,), jnp.int32)
        done = jnp.ones((B,), bool)  # all lanes start empty
        budget = jnp.zeros((B,), jnp.int32)
        hist = hstart = hend = None
        if self._spec_mode:
            hoff, hlen = self._hoff, self._hlen
            hist = jnp.zeros((B, hlen), jnp.int32)
            hstart = jnp.full((B,), hoff, jnp.int32)  # empty: start == end
            hend = jnp.full((B,), hoff, jnp.int32)
        if self.mesh is not None:
            tokens, lane_steps, done, budget = (
                jax.device_put(x, lane_sh)
                for x in (tokens, lane_steps, done, budget)
            )

        lane_req: "list[Optional[Request]]" = [None] * B
        lane_tokens: "list[list[int]]" = [[] for _ in range(B)]
        results: Dict[str, CompletedRequest] = {}
        eos_set: set = set()

        # donated: the pre-insert cache/lane state is dead after the call —
        # keeps the insert an in-place lane write instead of a full copy.
        # ``row`` selects the source row of a BATCHED refill prefill
        # (same-bucket requests prefill together; see retire_and_launch).
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
        def insert_lane(cache, tokens, lane_steps, done, budget,
                        new_cache, first_tok, lane, new_budget, row):
            def put(old, new):
                # Every leaf routed here is layer-stacked [L, B_rows, ...]
                # by construction (KVCache main fields and QuantizedKVRegion
                # leaves alike); anything else is a cache-layout change that
                # must fail loudly, not be silently skipped.
                if old.ndim < 2 or old.shape[2:] != new.shape[2:]:
                    raise ValueError(
                        f"insert_lane: unmergeable cache leaf {old.shape} vs "
                        f"{new.shape} — update the per-field handling"
                    )
                # explicit cast: a quantized-weight tree keeps f32 norms, so
                # its prefill cache can be f32 while the batched lane cache
                # is weight_dtype (bf16) — jax scatters will reject the
                # implicit downcast in a future release
                return old.at[:, lane].set(new[:, row].astype(old.dtype))

            quant = cache.quant
            if quant is not None:
                quant = jax.tree_util.tree_map(put, quant, new_cache.quant)
            think = cache.think
            if think is not None:
                think = jax.tree_util.tree_map(put, think, new_cache.think)
            tput = lambda a, b_: jax.tree_util.tree_map(put, a, b_)  # noqa: E731
            cache = cache._replace(  # tree_map: fields may be per-segment tuples
                k=tput(cache.k, new_cache.k),
                v=tput(cache.v, new_cache.v),
                mask=tput(cache.mask, new_cache.mask),
                positions=tput(cache.positions, new_cache.positions),
                true_len=cache.true_len.at[lane].set(new_cache.true_len[row]),
                step=cache.step,
                quant=quant,
                think=think,
            )
            tokens = tokens.at[lane].set(first_tok[row])
            lane_steps = lane_steps.at[lane].set(0)
            done = done.at[lane].set(False)
            budget = budget.at[lane].set(new_budget)
            return cache, tokens, lane_steps, done, budget

        # Free-lane prefills are LAUNCHED asynchronously (jax dispatch) and
        # lanes join the decode loop only once their prefill result is
        # ready — decode quanta for the active lanes never block on a
        # refill's prefill.  Same-bucket queued requests prefill TOGETHER
        # (one batched call per group, power-of-two group sizes so the
        # (bucket, rows) compile set stays bounded): sequential per-lane
        # prefills made CB prefill-bound at short contexts — 64 x 2k
        # requests on 32 lanes measured 232.6 tok/s wall vs 2007 for one
        # batched generate() (logs/tpu_r2ak).
        import time as _time

        run_t0 = _time.perf_counter()
        #: in-flight refill groups: lanes/reqs/first [R]/cache/max_news/t0
        pending_groups: "list[dict]" = []
        lane_t0: "dict[int, float]" = {}       # decode start per lane
        lane_prefill_s: "dict[int, float]" = {}
        lane_arrival: "dict[int, float]" = {}  # request arrival offsets
        lane_ttft: "dict[int, float]" = {}     # arrival -> first token

        def retire_and_launch():
            nonlocal cache, tokens, lane_steps, done, budget
            done_np = np.asarray(done)
            reserved = {ln for g in pending_groups for ln in g["lanes"]}
            free = []
            for lane in range(B):
                if not done_np[lane] or lane in reserved:
                    continue
                # retire the finished request
                req = lane_req[lane]
                if req is not None:
                    toks = lane_tokens[lane]
                    arr = lane_arrival.pop(lane, 0.0)
                    results[req.request_id] = CompletedRequest(
                        request_id=req.request_id, tokens=toks,
                        # wall-clock accounting: prefill = launch->insert
                        # (includes async overlap with other lanes' decode),
                        # decode = insert->retire (includes quantum slack)
                        prefill_seconds=lane_prefill_s.pop(lane, 0.0),
                        decode_seconds=_time.perf_counter()
                        - lane_t0.pop(lane, _time.perf_counter()),
                        arrival_time=arr,
                        ttft_seconds=lane_ttft.pop(lane, 0.0),
                        e2e_seconds=_time.perf_counter() - (run_t0 + arr),
                    )
                    lane_req[lane] = None
                    lane_tokens[lane] = []
                free.append(lane)
            while queue and free:
                # open-loop arrivals: only requests whose arrival_time has
                # passed are visible to the scheduler
                now_off = _time.perf_counter() - run_t0
                avail = [i for i, r in enumerate(queue)
                         if r.arrival_time <= now_off]
                if not avail:
                    break
                bucket = es.bucket_for(len(queue[avail[0]].prompt_ids))
                pfx = rpfx(queue[avail[0]])
                idxs = [i for i in avail
                        if es.bucket_for(len(queue[i].prompt_ids)) == bucket
                        and rpfx(queue[i]) is pfx]
                cap = max(1, self.refill_tokens // bucket)
                chunked = engine.chunked_prefill_supported(bucket)
                if chunked:
                    # HBM guard: each chunked refill carries a bucket-
                    # length full-KV state buffer (4.3 GB at 32k d32 —
                    # four concurrent states measured RESOURCE_EXHAUSTED,
                    # logs/tpu_r3g); admit rows only within the budget
                    in_flight = sum(
                        len(g2["lanes"]) * g2["toks"].shape[1]
                        for g2 in pending_groups if "fns" in g2)
                    budget_rows = (self.chunked_refill_tokens
                                   - in_flight) // bucket
                    if budget_rows < 1:
                        if in_flight:
                            break  # wait for the in-flight refill
                        # bucket > chunked_refill_tokens with NOTHING in
                        # flight: admit one refill anyway — the guard
                        # bounds CONCURRENT states, and zero admissions
                        # would starve the queue forever (livelock)
                        budget_rows = 1
                    cap = min(cap, budget_rows)
                rows = 1
                while rows * 2 <= min(len(idxs), len(free), cap):
                    rows *= 2
                group = [queue[i] for i in idxs[:rows]]
                for i in reversed(idxs[:rows]):
                    queue.pop(i)
                lanes_ = [free.pop(0) for _ in range(rows)]
                toks = np.zeros((rows, bucket), np.int32)
                tls = []
                for j, r in enumerate(group):
                    toks[j, bucket - len(r.prompt_ids):] = r.prompt_ids
                    tls.append(len(r.prompt_ids))
                g = dict(
                    lanes=lanes_, reqs=group, first=None, cache=None,
                    max_news=[min(r.max_new_tokens or es.max_new_tokens,
                                  es.max_new_tokens) for r in group],
                    t0=_time.perf_counter(),
                )
                if chunked:
                    # chunked refill: the prompt forward advances ONE chunk
                    # per decode quantum (`advance_refills`) so live lanes
                    # never stall behind a whole long prefill
                    fns = engine._get_prefill_chunked(bucket)
                    if engine.prefix_usable(
                            pfx, [r.prompt_ids for r in group], bucket):
                        state, nxt = engine._apply_prefix(
                            bucket, rows, pfx, tls, mesh=self.mesh)
                    else:
                        state, nxt = fns["init"](rows), 0
                    g.update(fns=fns, state=state,
                             toks=jnp.asarray(toks),
                             tls=jnp.asarray(tls, jnp.int32), next_chunk=nxt)
                    eos_set.update(int(e) for r in group
                                   for e in r.eos_token_ids)
                else:
                    logits, new_cache = engine._get_prefill(bucket)(
                        engine.params, jnp.asarray(toks),
                        jnp.asarray(tls, jnp.int32), jax.random.PRNGKey(0),
                    )
                    for j, r in enumerate(group):
                        if r.eos_token_ids:
                            cols = jnp.asarray(list(r.eos_token_ids),
                                               jnp.int32)
                            logits = logits.at[j, cols].set(-jnp.inf)
                            eos_set.update(int(e) for e in r.eos_token_ids)
                    g.update(
                        first=jnp.argmax(logits, axis=-1).astype(jnp.int32),
                        cache=new_cache,
                    )
                pending_groups.append(g)

        def advance_refill(g) -> None:
            """Dispatch the next chunk (or the finish) of a chunked refill."""
            fns = g["fns"]
            i = g["next_chunk"]
            chunks = fns["chunks"]
            c = fns["chunk_len"]
            if i < len(chunks):
                s = fns["tok_starts"][i]  # h2o lists each chunk twice
                g["state"], g["wq"], g["hl"] = chunks[i](
                    engine.params, g["state"], g["toks"][:, s * c:(s + 1) * c],
                    g["tls"])
                g["next_chunk"] = i + 1
                return
            logits, new_cache = fns["finish"](
                engine.params, g["state"], g["wq"], g["hl"], g["tls"],
                jax.random.PRNGKey(0))
            for j, r in enumerate(g["reqs"]):
                if r.eos_token_ids:
                    cols = jnp.asarray(list(r.eos_token_ids), jnp.int32)
                    logits = logits.at[j, cols].set(-jnp.inf)
            g["first"] = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            g["cache"] = new_cache
            for key in ("fns", "state", "toks", "tls", "wq", "hl"):
                g.pop(key, None)

        def advance_refills(to_completion: bool = False) -> None:
            for g in pending_groups:
                if "fns" not in g:
                    continue
                advance_refill(g)
                while to_completion and "fns" in g:
                    advance_refill(g)

        def harvest(block: bool):
            nonlocal cache, tokens, lane_steps, done, budget
            nonlocal hist, hstart, hend
            for g in list(pending_groups):
                if g["first"] is None:  # chunked refill still in flight
                    if not block:
                        continue
                    advance_refills(to_completion=True)
                if not block and not g["first"].is_ready():
                    continue
                pending_groups.remove(g)
                first = g["first"]
                first_np = np.asarray(first)
                now = _time.perf_counter()
                for j, (lane, req) in enumerate(zip(g["lanes"], g["reqs"])):
                    lane_req[lane] = req
                    lane_tokens[lane] = [int(first_np[j])]
                    if self.on_tokens is not None:
                        self.on_tokens(req.request_id, [int(first_np[j])])
                    lane_prefill_s[lane] = now - g["t0"]
                    lane_t0[lane] = now
                    lane_arrival[lane] = req.arrival_time
                    lane_ttft[lane] = now - (run_t0 + req.arrival_time)
                    cache, tokens, lane_steps, done, budget = insert_lane(
                        cache, tokens, lane_steps, done, budget,
                        g["cache"], first, lane, g["max_news"][j] - 1, j,
                    )
                    if self._spec_mode:
                        hoff = self._hoff
                        plen = len(req.prompt_ids)
                        prow = np.zeros((hoff,), np.int32)
                        prow[hoff - plen:] = req.prompt_ids
                        hist = hist.at[lane, :hoff].set(jnp.asarray(prow))
                        hist = hist.at[lane, hoff].set(first[j])
                        hstart = hstart.at[lane].set(hoff - plen)
                        hend = hend.at[lane].set(hoff + 1)

        eos_union = sorted(
            set(e for r in queue for e in r.eos_token_ids)
        ) or [-1]
        eos_arr = jnp.asarray(eos_union, jnp.int32)

        kchunk = es.spec_draft_len + 1
        retire_and_launch()
        harvest(block=True)
        while any(r is not None for r in lane_req) or pending_groups or queue:
            if (not pending_groups and queue
                    and all(r is None for r in lane_req)):
                # idle: every lane is free and nothing is in flight — the
                # whole backlog is future arrivals.  Sleep toward the next
                # arrival instead of burning decode quanta on empty lanes.
                next_arr = run_t0 + min(r.arrival_time for r in queue)
                wait = next_arr - _time.perf_counter()
                if wait > 0:
                    _time.sleep(min(wait, 0.05))
                retire_and_launch()
                harvest(block=bool(pending_groups))
                continue
            prev_done = np.asarray(done)
            if self._spec_mode:
                (cache, tokens, lane_steps, done, hist, hend,
                 emitted) = self._quantum_fn(
                    engine.params, cache, tokens, lane_steps, done, budget,
                    eos_arr, hist, hstart, hend,
                )
            else:
                cache, tokens, lane_steps, done, emitted = self._quantum_fn(
                    engine.params, cache, tokens, lane_steps, done, budget,
                    eos_arr,
                )
            em = np.asarray(emitted)
            for lane in range(B):
                if lane_req[lane] is None or prev_done[lane]:
                    continue
                new: "list[int]" = []
                if self._spec_mode:
                    # one (k+1)-chunk per verify iteration; -1 pads the
                    # rejected tail of each chunk
                    stop = False
                    for c in range(0, em.shape[1], kchunk):
                        for t in em[lane, c:c + kchunk]:
                            t = int(t)
                            if t < 0:
                                break
                            if t in eos_set:
                                stop = True
                                break
                            new.append(t)
                        if stop:
                            break
                else:
                    for t in em[lane]:
                        t = int(t)
                        if t < 0 or t in eos_set:
                            break
                        new.append(t)
                lane_tokens[lane].extend(new)
                if new and self.on_tokens is not None:
                    self.on_tokens(lane_req[lane].request_id, new)
            retire_and_launch()
            # one refill chunk per quantum: the chunk dispatch queues behind
            # the NEXT quantum's steps, so decode progresses during long
            # refills at chunk granularity instead of stalling end-to-end
            advance_refills()
            # insert any prefills that finished while the quantum ran; if no
            # lane is active, wait for one so the loop always progresses
            harvest(block=not any(r is not None for r in lane_req))
        return results


class BatchScheduler:
    """Greedy bucket-and-pack scheduler.

    Requests are queued, grouped by the prefill bucket their length maps to,
    and executed in lanes of exactly ``batch_size`` (short final groups are
    padded by repeating the last request so every (bucket, batch) shape
    compiles once and is reused).
    """

    def __init__(self, engine: Engine, batch_size: int = 1,
                 prefix_registry=None):
        assert batch_size >= 1
        self.engine = engine
        self.batch_size = batch_size
        self.queue: List[Request] = []
        #: optional ``engine.PrefixRegistry`` — like the
        #: ContinuousBatcher, requests without an explicit handle get the
        #: longest registered prefix auto-attached; groups key on the
        #: handle so every `generate` batch shares one
        self.prefix_registry = prefix_registry

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def pending(self) -> int:
        return len(self.queue)

    def run(self) -> Dict[str, CompletedRequest]:
        es = self.engine.engine_spec
        # Resolve registry matches into a LOCAL map (never mutate the
        # caller-owned Request objects) and validate every handle — token
        # prefix + plan support — DURING grouping, falling back to
        # prefix=None on mismatch so a bad handle can't abort the run
        # after the queue was drained (ADVICE r4).
        groups: Dict[tuple, List[Request]] = {}
        prefixes: Dict[int, object] = {}
        for r in self.queue:
            bucket = es.bucket_for(len(r.prompt_ids))
            pfx = r.prefix
            if pfx is None and self.prefix_registry is not None:
                pfx = self.prefix_registry.match(r.prompt_ids)
            usable = self.engine.prefix_usable(pfx, [r.prompt_ids], bucket)
            key = (bucket, r.max_new_tokens or es.max_new_tokens,
                   tuple(r.eos_token_ids),
                   id(pfx) if usable else 0)
            prefixes[key[-1]] = pfx if usable else None
            groups.setdefault(key, []).append(r)
        self.queue = []

        results: Dict[str, CompletedRequest] = {}
        for (bucket, max_new, eos, pid), reqs in sorted(groups.items()):
            for i in range(0, len(reqs), self.batch_size):
                chunk = reqs[i : i + self.batch_size]
                lane = list(chunk)
                while len(lane) < self.batch_size:  # pad the last group
                    lane.append(chunk[-1])
                out: GenerationOutput = self.engine.generate(
                    [r.prompt_ids for r in lane],
                    max_new_tokens=max_new,
                    eos_token_ids=eos,
                    prefix=prefixes[pid],
                )
                for j, r in enumerate(chunk):
                    results[r.request_id] = CompletedRequest(
                        request_id=r.request_id,
                        tokens=out.tokens[j],
                        prefill_seconds=out.prefill_seconds,
                        decode_seconds=out.decode_seconds,
                    )
        return results
