"""Continuous batching: many concurrent streaming requests share ONE jitted
decode step over a fixed pool of batch slots.

The reference worker serializes requests behind a semaphore
(`pipeline/serve/model_worker.py:156-160,296-309`) — each request runs its
own HF generate. Here a request is admitted into a free slot (single-row
prefill at a bucketed length, KV scattered into the pooled cache), and one
decode step advances EVERY active slot per iteration, so aggregate tok/s
scales with concurrency instead of queueing. TPU-native constraints shape
the design:

  - static shapes: the slot pool, cache length and prefill buckets are
    fixed; jit variants are keyed by bucket only
  - per-row cache offsets: each slot has its own length; the decoder's
    vector `cache_pos` path scatters the new KV at `written[slot]`
  - per-row sampling: temperature/top-k/top-p/eos are [B] arrays inside
    one jitted sampler (no per-request recompiles)
  - sequence-aware bans (no_repeat_ngram/bad_words) run per distinct
    config present among active slots, row-gated, against the pooled
    on-device token buffer
"""

from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from otter_tpu.config import GenerationConfig
from otter_tpu.generation import sampling
from otter_tpu.generation.engine import left_pad
from otter_tpu.models.decoder import init_cache


def _round_bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket "
                     f"{buckets[-1]}")


def autotune_num_slots(params, cfg, cache_len: int, cache_dtype,
                       *, hbm_bytes: float = 16e9,
                       headroom_bytes: float = 1.5e9,
                       max_slots: int = 32, draft=None) -> int:
    """Slot-count autotuning: the largest pool whose KV cache fits the
    declared HBM budget next to the resident params.

    budget = hbm_bytes − params − headroom (workspace/temps/latents);
    per-slot cost = one cache row (k+v and, for quantized caches, their
    scales). The tunnel backend exposes no memory_stats, so the budget
    is declared, not probed — pass the device's real capacity (v5e:
    16e9). Returns at least 1 (a model whose single-slot footprint
    exceeds the budget will OOM regardless of the pool size). With
    `draft=(model_d, params_d, cfg_d)` (slot-pool speculation) the
    draft's resident params and its per-slot cache row join the
    budget."""
    def nbytes(tree):
        return sum(np.prod(x.shape) * jnp.dtype(x.dtype).itemsize
                   for x in jax.tree_util.tree_leaves(tree))

    def row_bytes_of(text_cfg):
        row = jax.eval_shape(
            lambda: init_cache(text_cfg, 1, cache_len, cache_dtype))
        return sum(x.size * jnp.dtype(x.dtype).itemsize
                   for x in jax.tree_util.tree_leaves(row))

    param_bytes = float(nbytes(params))
    row_bytes = row_bytes_of(cfg.text)
    if draft is not None:
        param_bytes += float(nbytes(draft[1]))
        row_bytes += row_bytes_of(draft[2].text)
    free = hbm_bytes - param_bytes - headroom_bytes
    return max(1, min(max_slots, int(free // max(row_bytes, 1))))


def filter_rows(scaled, top_k, top_p):
    """Per-row top-k + top-p filtering on pre-scaled logits [B, V];
    `top_k` [B] int (0 = off) and `top_p` [B] float (1.0 = off).

    ONE full-vocab sort total: the top-k filter replaces a value-ordered
    SUFFIX of the sorted view with NEG_INF, so the sorted view of the
    filtered logits is the same `where` applied to the sorted array —
    no re-sort is needed for the nucleus pass (at V=50k this sort is the
    sampled continuous-batching hot path)."""
    v = scaled.shape[-1]
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    # per-row top-k: threshold at the k-th largest (k=0 -> no filter)
    k_idx = jnp.clip(top_k - 1, 0, v - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    kmask = top_k[:, None] > 0
    scaled = jnp.where(kmask & (scaled < kth), sampling.NEG_INF, scaled)
    sorted_f = jnp.where(kmask & (sorted_desc < kth), sampling.NEG_INF,
                         sorted_desc)
    # per-row top-p (nucleus), always keeping the argmax
    probs = jax.nn.softmax(sorted_f, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < top_p[:, None]
    thresh = jnp.min(jnp.where(keep, sorted_f, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(scaled < thresh, sampling.NEG_INF, scaled)


def sample_rows(rng, logits, *, do_sample, temperature, top_k, top_p):
    """Vectorized per-row sampling: every control is a [B] array.

    Logits are scaled in float32 so the categorical draw samples from
    EXACTLY the distribution `proc_rows` reports as the speculative
    proposal q (bf16 filtering would make p/q off by rounding)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = (logits.astype(jnp.float32)
              / jnp.maximum(temperature, 1e-6)[:, None])
    scaled = filter_rows(scaled, top_k, top_p)
    sampled = jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(do_sample, sampled, greedy)


class _SchedulerError:
    """Sentinel delivered on every stream queue when the scheduler
    thread dies; stream() re-raises it on the consumer's thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


@dataclass
class _Slot:
    active: bool = False
    pending: bool = False   # admitted (prefill dispatched), first token
    #                         not yet forced — excluded from decode,
    #                         unavailable for re-admission
    gen: Optional[GenerationConfig] = None
    out: Optional[queue.Queue] = None
    real_len: int = 0       # true prompt tokens (pads excluded)
    bucket: int = 0         # prefill bucket = first decode write column
    written: int = 0        # next cache column to write
    emitted: int = 0        # generated tokens so far
    media: int = 0          # <image> tokens in the prompt
    last_tok: int = 0
    group: Optional[int] = None   # beam-group id (num_beams > 1)
    # per-request latency accounting
    t_submit: float = 0.0   # request enqueue time
    t_admit: float = 0.0    # prefill+insert done (first token available)
    t_first: float = 0.0    # first token delivered to the consumer
    # speculative-decoding acceptance EMA (committed tokens/round for
    # this slot; None until the first spec round drains)
    accept_ema: Optional[float] = None


@dataclass
class _BeamGroup:
    """One num_beams>1 request occupying `rows` slots in lockstep: the
    shared decode step advances every beam row like any other slot, then a
    per-group top-2k candidate pass (HF beam semantics, mirroring
    generation/beam.py) reorders the group's cache/buffer rows to the
    selected parent beams. Tokens are delivered on completion (beam
    hypotheses can revise earlier tokens, which the per-token stream
    contract cannot express)."""
    gen: GenerationConfig
    out: queue.Queue
    rows: List[int] = field(default_factory=list)
    gid: int = -1
    scores: Any = None                   # live beam scores, np [k] f32
    hyps: List[List[int]] = field(default_factory=list)   # live tokens
    fin: List[Tuple[float, List[int]]] = field(default_factory=list)
    t_submit: float = 0.0


class ContinuousBatcher:
    """Slot-pool streaming engine. `submit()` is thread-safe and returns an
    iterator of token ids; a background thread multiplexes all requests
    through one decode step per iteration."""

    def __init__(self, model, params, cfg, *, num_slots=4,
                 cache_len: int = 2048,
                 buckets: Tuple[int, ...] = (32, 64, 128, 256, 512, 1024),
                 max_media: int = 1, cache_dtype=jnp.bfloat16,
                 rng_seed: int = 0, max_admits_per_iter: int = 1,
                 hbm_bytes: Optional[float] = None, prefill_chunk: int = 0,
                 draft=None, spec_gamma: int = 4,
                 spec_adaptive: bool = True):
        self.model = model
        self.params = params
        self.cfg = cfg
        # slot-pool speculative decoding: draft = (model_d, params_d,
        # cfg_d) turns every decode iteration into a speculative ROUND
        # (gamma batched draft steps + one batched s=gamma+1 target
        # verify window) advancing each slot by 1..gamma+1 tokens.
        # Greedy rows emit exactly the target's greedy tokens; sampled
        # rows are distributionally exact (accept_resample is correct
        # for ANY proposal distribution). Beam requests are capped to
        # num_beams=1 while a draft is attached — beams revise their
        # past, which the nothing-rolled-back cache scheme cannot.
        if draft is not None:
            self.model_d, self.params_d, self.cfg_d = draft
            assert self.cfg_d.text.vocab_size == cfg.text.vocab_size, \
                "slot-pool speculation requires a shared vocabulary"
            assert max(buckets) + spec_gamma + 1 <= cache_len, \
                "cache_len must leave a gamma+1 verify window after the " \
                "largest prompt bucket"
        else:
            self.model_d = self.params_d = self.cfg_d = None
        self.gamma = spec_gamma
        # degrade-not-die: a fixed (num_slots, cache_len, cache_dtype)
        # whose pool does not fit HBM drops cache precision one step
        # (bf16 -> int8 -> int4, warned) before giving up slots — the
        # engine-side twin of OtterGenerator._cache_dtype_for
        if hbm_bytes is None:
            hbm_bytes = float(os.environ.get("OTTER_HBM_BYTES", 16e9))
        if num_slots != "auto":
            from otter_tpu.generation.engine import select_cache_dtype
            all_params = (params if draft is None
                          else {"t": params, "d": draft[1]})
            cache_dtype = select_cache_dtype(
                all_params, cfg.text, num_slots, cache_len, cache_dtype,
                hbm_bytes=hbm_bytes)
        if num_slots == "auto":
            num_slots = autotune_num_slots(
                params, cfg, cache_len, cache_dtype, hbm_bytes=hbm_bytes,
                draft=draft)
        self.n = num_slots
        self.L = cache_len
        self.buckets = tuple(sorted(buckets))
        self.max_media = max_media
        self.cache_dtype = cache_dtype
        # admission under decode pressure: a prefill stalls every active
        # stream for one iteration, so while anything is decoding at most
        # this many requests are admitted per loop iteration (idle pool ->
        # drain the queue freely)
        self.max_admits_per_iter = max_admits_per_iter
        # chunked prefill: a long prompt's prefill is one device program,
        # so while it runs EVERY active decode stream stalls for its full
        # duration (618 ms at OtterHD full-HD). prefill_chunk > 0 splits
        # eligible admissions (single-stream, bucket > chunk) into
        # chunk-sized cache-append steps interleaved with decode
        # iterations — ONE chunk (of one admission, round-robin) rides
        # after each decode step, so the per-stream stall is bounded by
        # one chunk's time regardless of how many admissions are in
        # flight. The assembled cache is numerically equivalent to the
        # one-shot prefill at every attendable position (1e-5,
        # tests/test_batching; the two paths use different attention
        # programs, so bf16 bit-exactness is NOT guaranteed).
        if prefill_chunk:
            eligible = [b for b in buckets
                        if b > prefill_chunk and b % prefill_chunk == 0]
            skipped = [b for b in buckets
                       if b > prefill_chunk and b % prefill_chunk != 0]
            if not eligible:
                raise ValueError(
                    f"prefill_chunk={prefill_chunk} divides none of the "
                    f"buckets {buckets} — chunking would silently never "
                    f"activate; pick a chunk that divides the long "
                    f"buckets (e.g. a power of two)")
            if skipped:
                import warnings
                warnings.warn(
                    f"prefill_chunk={prefill_chunk}: buckets {skipped} "
                    f"are not divisible and will use one-shot prefill")
        self.prefill_chunk = prefill_chunk
        self._chunk_tasks: List[dict] = []    # admissions mid-prefill
        self._ready_chunked: List[dict] = []  # all chunks dispatched
        self._chunk_fns: Dict[Any, Any] = {}
        self._encode_fn = None
        self._completed: List[dict] = []   # per-request latency records

        self._slots = [_Slot() for _ in range(num_slots)]
        self._groups: Dict[int, _BeamGroup] = {}
        self._next_group = 0
        self._deferred: List[tuple] = []   # beam requests awaiting k slots
        self._pending: "queue.Queue[tuple]" = queue.Queue()
        self._rng = jax.random.PRNGKey(rng_seed)
        self._lock = threading.Lock()
        self._work = threading.Event()
        self._stop = False
        self._failure: Optional[BaseException] = None

        # pooled device state
        self._cache = init_cache(cfg.text, num_slots, cache_len, cache_dtype)
        self._buffer = jnp.zeros((num_slots, cache_len), jnp.int32)
        self._valid = jnp.zeros((num_slots, cache_len), bool)
        self._latents: Optional[jnp.ndarray] = None  # lazy: needs latent dims
        # draft pools (spec mode): the draft's KV mirrors the target's
        # column layout exactly (same buffer/valid), so only the cache
        # and vision latents are model-specific
        if self.model_d is not None:
            self._cache_d = init_cache(self.cfg_d.text, num_slots,
                                       cache_len, cache_dtype)
            self._latents_d: Optional[jnp.ndarray] = None
        self._spec_fns: Dict[Any, Any] = {}

        # ── acceptance-adaptive speculation (round 5, VERDICT r4 #3) ──
        # Round time at a given gamma is acceptance-INDEPENDENT (static
        # shapes), so the break-even is computable online: spec(g) beats
        # plain iff E[tokens/round] > T_spec(g)/T_plain. The controller
        # tracks an EMA of committed tokens/round per gamma and an EMA
        # of iteration wall time per mode, probes the candidate modes
        # (gamma ladder {spec_gamma, spec_gamma//2, ...} + plain) when
        # it lacks a measurement, and switches to the fastest mode with
        # 5% hysteresis — including AUTO-DROPPING TO PLAIN DECODE below
        # break-even, so sampled low-alpha traffic (measured 0.99x at
        # T=1 gamma=4, BENCH_NOTES r4) can never run slower than a
        # draft-free pool. Every mode emits exactly the same tokens
        # (greedy rows are target-exact; sampled rows distributionally
        # exact), so probing costs only throughput, never quality.
        self.spec_adaptive = bool(spec_adaptive and draft is not None)
        self._mode_now: Any = ("spec", spec_gamma)
        self._probe_plan: List[Any] = []
        self._accept_ema: Dict[int, float] = {}     # gamma -> E[tok/round]
        self._iter_times: Dict[Any, float] = {}     # mode -> s/iteration
        self._t_last_iter: Optional[float] = None
        self._last_mode: Any = None
        self._ctrl_count = 0
        self._stale_count = 0      # iterations since suspended modes probed
        self._draft_stale = False  # draft cache missed committed tokens
        self._catchup_fn = None
        # controller cadence (instance attrs so tests can shrink them)
        self._replan_every = 32    # drained iterations between decisions
        self._probe_len = 8        # iterations per mode probe
        self._stale_every = 1024   # refresh suspended modes' estimates

        self._prefill_fns: Dict[Any, Any] = {}
        self._insert_fns: Dict[Any, Any] = {}
        self._decode_fns: Dict[Any, Any] = {}
        self._beam_cand_fns: Dict[int, Any] = {}
        self._beam_reorder_fn = None

        # pipelined decode: carried device slot state + in-flight
        # iterations awaiting their token readback
        self.pipeline_depth = 1
        self._carried: Optional[Dict[str, Any]] = None
        self._statics: Optional[Dict[str, Any]] = None
        self._lp_list: Tuple = ()
        self._dirty = True
        self._inflight: List[tuple] = []

        # admission finisher: first-token forces are ~30 ms relay
        # readbacks; doing them on the scheduler thread stalls every
        # active decode stream for the duration. The finisher thread
        # owns the blocking readback; the slot joins the decode pool
        # (pending -> active) when its token lands in `_finished`.
        self._force_q: "queue.Queue[tuple]" = queue.Queue()
        self._finished: List[tuple] = []
        self._finisher = threading.Thread(target=self._force_loop,
                                          daemon=True)
        self._finisher.start()

        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ── public API ────────────────────────────────────────────────────

    def submit(self, vision_x, lang_x,
               gen: Optional[GenerationConfig] = None):
        """Enqueue one request; yields generated token ids (eos excluded).

        num_beams > 1 runs HF-semantics beam search inside the slot pool
        (the request occupies num_beams slots in lockstep); the best
        hypothesis's tokens are delivered on COMPLETION — beam hypotheses
        can revise earlier tokens, which a per-token stream cannot
        express. num_beams is capped at the pool size."""
        gen = gen or GenerationConfig()
        if self.model_d is not None and gen.num_beams > 1:
            # beams revise their past; the nothing-rolled-back
            # speculative cache scheme cannot, so spec pools serve
            # beamed requests as num_beams=1
            gen = gen.replace(num_beams=1)
        if gen.num_beams > self.n:
            gen = gen.replace(num_beams=self.n)
        if self._failure is not None:
            raise RuntimeError(
                "ContinuousBatcher scheduler thread has failed"
            ) from self._failure
        out: "queue.Queue" = queue.Queue()
        self._pending.put((np.asarray(vision_x), np.asarray(lang_x),
                           gen, out, time.monotonic()))
        self._work.set()

        def stream():
            while True:
                tok = out.get()
                if tok is None:
                    return
                if isinstance(tok, _SchedulerError):
                    raise RuntimeError(
                        "ContinuousBatcher scheduler thread failed; "
                        "stream aborted") from tok.exc
                yield tok

        return stream()

    def shutdown(self):
        self._stop = True
        self._work.set()
        self._thread.join(timeout=10)
        self._finisher.join(timeout=10)

    def active_count(self) -> int:
        with self._lock:
            return (sum(s.active or s.pending for s in self._slots)
                    + self._pending.qsize())

    def _force_loop(self):
        """Finisher thread: blocks on each admitted first token's
        device->host readback off the scheduler's critical path."""
        while not self._stop:
            try:
                slot, dev = self._force_q.get(timeout=0.2)
            except queue.Empty:
                continue
            tok = int(np.asarray(dev))
            with self._lock:
                self._finished.append((slot, tok))
            self._work.set()

    def _collect_admitted(self):
        """Scheduler-thread half of async admission: move force-completed
        slots into the decode pool. Caller must have drained in-flight
        iterations (slot state mutates here)."""
        with self._lock:
            done, self._finished = self._finished, []
        for slot, tok in done:
            slot.pending = False
            slot.active = True
            self._admit_finish_slot(slot, tok)
            self._dirty = True

    # ── jitted pieces ─────────────────────────────────────────────────

    def _get_prefill(self, bucket: int, which: str = "t"):
        key = (bucket, which)
        if key not in self._prefill_fns:
            model = self.model if which == "t" else self.model_d
            cfg = self.cfg if which == "t" else self.cfg_d

            def prefill(params, vision_x, lang_x, mask):
                cache = init_cache(cfg.text, 1, bucket, self.cache_dtype)
                positions = jnp.clip(jnp.cumsum(mask, axis=-1) - 1, 0,
                                     None).astype(jnp.int32)
                logits, cache, lat = model.apply(
                    params, vision_x, lang_x, attention_mask=mask,
                    positions=positions, cache=cache, head_last_only=True)
                return logits[:, -1], cache, lat
            self._prefill_fns[key] = jax.jit(prefill)
        return self._prefill_fns[key]

    def _get_insert_d(self, bucket: int):
        """Draft-pool half of an admission: scatter the draft's local
        prefill cache + vision latents into the pooled draft state (the
        shared buffer/valid rows are written by the target insert)."""
        key = ("d", bucket)
        if key not in self._insert_fns:
            def insert(big, small, latents, slot, lat_row):
                def put(dst, src):
                    if dst.ndim == 5:
                        return dst.at[slot, :, :, :bucket, :].set(src[0])
                    return dst.at[slot, :, :, :bucket].set(src[0])
                big = {k: put(big[k], small[k]) for k in big}
                t = lat_row.shape[1]
                latents = latents.at[slot, :t].set(lat_row[0])
                return big, latents
            self._insert_fns[key] = jax.jit(insert,
                                            donate_argnums=(0, 2))
        return self._insert_fns[key]

    def _get_insert(self, bucket: int):
        if bucket not in self._insert_fns:
            def insert(big, small, buffer, valid, latents, slot,
                       ids_row, mask_row, lat_row):
                # stacked cache [B, NL, hk, L, d]: one scatter per cache
                # array covers every layer's slot row (int8 caches carry
                # extra [B, NL, hk, L] scale arrays)
                def put(dst, src):
                    if dst.ndim == 5:
                        return dst.at[slot, :, :, :bucket, :].set(src[0])
                    return dst.at[slot, :, :, :bucket].set(src[0])
                big = {key: put(big[key], small[key]) for key in big}
                buffer = buffer.at[slot, :bucket].set(ids_row)
                row_valid = jnp.zeros((self.L,), bool).at[:bucket].set(
                    mask_row.astype(bool))
                valid = valid.at[slot].set(row_valid)
                t = lat_row.shape[1]
                latents = latents.at[slot, :t].set(lat_row[0])
                return big, buffer, valid, latents
            self._insert_fns[bucket] = jax.jit(insert,
                                               donate_argnums=(0, 2, 3, 4))
        return self._insert_fns[bucket]

    # ── chunked prefill ──────────────────────────────────────────────

    def _get_encode(self):
        if self._encode_fn is None:
            self._encode_fn = jax.jit(
                lambda params, vx: self.model.apply(
                    params, vx, method="encode_vision"))
        return self._encode_fn

    def _get_chunk(self, bucket: int, t_img: int, n_lat: int):
        """One prefill chunk: append `prefill_chunk` prompt tokens into a
        b=1 local cache via the decoder's s>1 decode path (intra-block
        causality + kv_valid). The chunk index is a traced scalar, so one
        compilation per bucket serves every chunk. The xattn media ids
        come from the FULL padded prompt (sliced per chunk) — mid-prompt
        chunks can precede their media tokens, which the decode-mode
        media_counts formula cannot express (models/otter.py xattn_ids)."""
        key = (bucket, t_img, n_lat)
        if key not in self._chunk_fns:
            C = self.prefill_chunk
            cfg = self.cfg

            def chunk(params, cache, lat, ids, mask, ci):
                from otter_tpu.ops.masks import media_attention_ids
                S = ids.shape[1]
                off = ci * C
                positions = jnp.clip(jnp.cumsum(mask, -1) - 1, 0,
                                     None).astype(jnp.int32)
                q_f, kv_ids, keep_f = media_attention_ids(
                    ids == cfg.media_token_id, t_img, n_lat,
                    only_attend_immediate_media=
                    cfg.only_attend_immediate_media,
                    attend_previous=True)  # matches _get_prefill's default
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, off, C, 1)
                kv_valid = mask.astype(bool) & (
                    jnp.arange(S)[None, :] < (ci + 1) * C)
                logits, cache, _ = self.model.apply(
                    params, None, sl(ids), vis_latents=lat,
                    cache=cache, cache_pos=off, kv_valid=kv_valid,
                    positions=sl(positions),
                    xattn_ids=(sl(q_f), kv_ids, sl(keep_f)),
                    head_last_only=True)
                return cache, logits[:, -1]

            self._chunk_fns[key] = jax.jit(chunk, donate_argnums=(1,))
        return self._chunk_fns[key]

    def _chunk_begin(self, vision_x, lang_x, gen, out,
                     t_submit: float = 0.0):
        """Reserve a slot and dispatch the vision encode + first chunk;
        the scheduler loop advances one chunk per iteration thereafter."""
        free = next(i for i, s in enumerate(self._slots)
                    if not s.active and not s.pending)
        lang_x = np.asarray(lang_x)
        real = int(lang_x.shape[1])
        bucket = _round_bucket(real, self.buckets)
        ids, mask = left_pad(lang_x, None, target_len=bucket,
                             pad_id=gen.pad_token_id)
        lat = self._get_encode()(self.params, jnp.asarray(vision_x))
        task = dict(slot=free, gen=gen, out=out, t_submit=t_submit,
                    vx=np.asarray(vision_x),
                    cache=init_cache(self.cfg.text, 1, bucket,
                                     self.cache_dtype),
                    lat=lat, ids=jnp.asarray(ids), mask=jnp.asarray(mask),
                    real=real, bucket=bucket, next=0,
                    n=bucket // self.prefill_chunk,
                    media=int(np.sum(lang_x == self.cfg.media_token_id)),
                    last=None)
        slot = self._slots[free]
        slot.gen = gen
        slot.out = out
        slot.pending = True
        slot.active = False
        slot.t_submit = t_submit
        self._chunk_tasks.append(task)
        self._advance_task(task)
        return task

    def _advance_task(self, task):
        t_img, n_lat = task["lat"].shape[1], task["lat"].shape[2]
        fn = self._get_chunk(task["bucket"], t_img, n_lat)
        task["cache"], task["last"] = fn(
            self.params, task["cache"], task["lat"], task["ids"],
            task["mask"], jnp.int32(task["next"]))
        task["next"] += 1
        if task["next"] >= task["n"]:
            self._chunk_tasks.remove(task)
            self._ready_chunked.append(task)

    def _advance_chunked(self):
        # ONE chunk per scheduler iteration, round-robin across in-flight
        # admissions: advancing every task each iteration would stack K
        # chunk programs between decode steps and the advertised
        # one-chunk stall bound would scale with admission concurrency
        if self._chunk_tasks:
            self._advance_task(self._chunk_tasks[0])
            if self._chunk_tasks:
                self._chunk_tasks.append(self._chunk_tasks.pop(0))

    def _finalize_chunked(self):
        """Pooled-state half of a chunked admission (caller must have
        drained in-flight iterations): insert the assembled local cache,
        sample the first token, and hand it to the finisher — from here
        the flow is identical to `_admit_start`'s tail."""
        ready, self._ready_chunked = self._ready_chunked, []
        for task in ready:
            free, gen = task["slot"], task["gen"]
            bucket, real = task["bucket"], task["real"]
            lat = task["lat"]
            if self._latents is None:
                shape = (self.n, self.max_media) + tuple(lat.shape[2:])
                self._latents = jnp.zeros(shape, lat.dtype)
            self._cache, self._buffer, self._valid, self._latents = \
                self._get_insert(bucket)(
                    self._cache, task["cache"], self._buffer, self._valid,
                    self._latents, free, task["ids"][0], task["mask"][0],
                    lat)
            if self.model_d is not None:
                # the draft prefills ONE-SHOT even when the target was
                # chunked: draft models are ~an order of magnitude
                # smaller, so their prefill is far below the chunk-stall
                # bound chunking exists to enforce
                self._admit_draft(bucket, task["vx"], task["ids"],
                                  task["mask"], free)
            self._rng, sub = jax.random.split(self._rng)
            first_logits = task["last"]
            if gen.no_repeat_ngram_size or gen.bad_words_ids:
                first_logits = sampling.process_logits(
                    first_logits, task["ids"], bucket, gen, bucket - real)
            tok_dev = sampling.sample_token(
                sub, first_logits, do_sample=gen.do_sample,
                temperature=gen.temperature, top_k=gen.top_k,
                top_p=gen.top_p)[0]
            slot = self._slots[free]
            slot.real_len = real
            slot.bucket = bucket
            slot.written = bucket
            slot.emitted = 1
            slot.media = task["media"]
            self._force_q.put((slot, tok_dev))

    def _get_decode(self, lp_configs: Tuple[Tuple[int, Any], ...],
                    need_logits: bool = False):
        """lp_configs: distinct (ngram, bad_words_ids) among active slots;
        rows select theirs via lp_idx (-1 = none). need_logits additionally
        returns the processed logits (device) for beam-group selection —
        a separate compiled variant so beam-free serving keeps the leaner
        graph."""
        key = (lp_configs, need_logits)
        if key in self._decode_fns:
            return self._decode_fns[key]

        def decode(params, cache, buffer, valid, latents, toks, alive,
                   written, emitted, real_len, media, lp_idx, valid_from,
                   do_sample, temperature, top_k, top_p, eos, max_new,
                   rng):
            cols = jnp.arange(self.L)[None, :]
            kv_valid = valid | (cols == written[:, None])
            positions = real_len + emitted - 1
            logits, cache, _ = self.model.apply(
                params, None, toks[:, None], vis_latents=latents,
                cache=cache, cache_pos=written, kv_valid=kv_valid,
                positions=positions[:, None], media_counts=media)
            logits = logits[:, -1]
            buffer = buffer.at[jnp.arange(self.n), written].set(toks)
            valid = kv_valid
            # row-gated sequence bans per distinct config
            for ci, (ngram, bad_words) in enumerate(lp_configs):
                gen = GenerationConfig(no_repeat_ngram_size=ngram,
                                       bad_words_ids=bad_words)
                processed = sampling.process_logits(
                    logits, buffer, written + 1, gen, valid_from)
                logits = jnp.where((lp_idx == ci)[:, None], processed,
                                   logits)
            nxt = sample_rows(rng, logits, do_sample=do_sample,
                              temperature=temperature, top_k=top_k,
                              top_p=top_p)
            nxt = jnp.where(alive, nxt, 0)
            # device-side slot-state advance: lets the scheduler dispatch
            # iteration t+1 from t's DEVICE outputs, with no host readback
            # on the critical path (the relay roundtrip overlaps compute)
            emitted2 = emitted + alive
            written2 = written + alive
            alive2 = (alive & (nxt != eos) & (emitted2 < max_new)
                      & (written2 < self.L))
            out = (nxt, alive2, written2, emitted2, cache, buffer, valid)
            return out + (logits,) if need_logits else out

        # donate cache/buffer/valid: threaded through the jit boundary
        # every step, reassigned from the returns
        self._decode_fns[key] = jax.jit(decode, donate_argnums=(1, 2, 3))
        return self._decode_fns[key]

    # ── slot-pool speculative round ───────────────────────────────────

    def _get_spec_round(self, lp_configs: Tuple[Tuple[int, Any], ...],
                        g: int):
        """One batched speculative ROUND over the whole slot pool: gamma
        draft steps (each a [B]-batched decode), one s=gamma+1 target
        verify window at per-row offsets, then a per-row accept/advance.

        Invariants mirror the plain decode step exactly — `toks` is the
        delivered-but-uningested token at column `written`; the round
        commits 1..gamma+1 NEW tokens per row, marks exactly their
        columns in `valid`, and leaves the last emitted token pending.
        Rejected draft KV is never rolled back: its columns stay outside
        `valid` and are overwritten by later rounds (the standalone
        generator's scheme, generation/speculative.py module doc).

        The draft opener is an s=2 window over [buffer[W-1], toks]: a
        fully-accepted previous round leaves the draft cache one column
        short (the target verified d_gamma but the draft never ingested
        it); re-ingesting W-1 is idempotent where already cached and
        closes the gap. Greedy rows emit EXACTLY the plain batcher's
        greedy tokens; sampled rows are distributionally exact for ANY
        proposal (accept_resample, Leviathan et al. 2211.17192)."""
        key = ("spec", g, lp_configs)
        if key in self._spec_fns:
            return self._spec_fns[key]
        B, L = self.n, self.L
        g_max = self.gamma    # cache-room stop uses the LADDER MAX so a
        #                       later gamma raise never dispatches a row
        #                       whose verify window would overflow the
        #                       cache (adaptive controller, round 5)
        cols = jnp.arange(L)[None, :]

        def win_valid(valid, written, last_off):
            # committed columns plus this round's window [W-1, W+last_off]
            return valid | ((cols >= (written - 1)[:, None])
                            & (cols <= (written + last_off)[:, None]))

        def proc_rows(logits, temperature, top_k, top_p):
            # the PROCESSED per-row sampling distribution — identical
            # temp/top-k/top-p order to sample_rows, so categorical over
            # filter_rows == sampling from these probs
            scaled = (logits.astype(jnp.float32)
                      / jnp.maximum(temperature, 1e-6)[:, None])
            return jax.nn.softmax(filter_rows(scaled, top_k, top_p), -1)

        def spec(params, params_d, cache, cache_d, buffer, valid,
                 latents, latents_d, toks, alive, written, emitted,
                 real_len, media, lp_idx, valid_from, do_sample,
                 temperature, top_k, top_p, eos, max_new, rng):
            rows = jnp.arange(B)
            buffer = buffer.at[rows, written].set(toks)
            # never-admitted/dead rows have written=0 / emitted=0; clamp
            # the opener's indices so no-corruption does not depend on
            # JAX's out-of-bounds gather/scatter semantics (admission
            # fully rewrites such rows anyway)
            w1 = jnp.maximum(written - 1, 0)
            pos0 = jnp.maximum(real_len + emitted - 1, 1)  # RoPE pos of
            #                                                `toks`
            prev = buffer[rows, w1]
            kd, ka = jax.random.split(rng)

            # draft opener: s=2 [prev, toks] at W-1 (gap-closing)
            lg_d, cache_d, _ = self.model_d.apply(
                params_d, None, jnp.stack([prev, toks], 1),
                vis_latents=latents_d, cache=cache_d,
                cache_pos=w1,
                kv_valid=win_valid(valid, written, 0),
                positions=jnp.stack([pos0 - 1, pos0], 1),
                media_counts=media)
            lg1 = lg_d[:, -1]
            d1 = sample_rows(jax.random.fold_in(kd, 0), lg1,
                             do_sample=do_sample, temperature=temperature,
                             top_k=top_k, top_p=top_p)
            q1 = proc_rows(lg1, temperature, top_k, top_p)

            def draft_step(carry, i):
                tok, cache_d = carry
                lg, cache_d, _ = self.model_d.apply(
                    params_d, None, tok[:, None], vis_latents=latents_d,
                    cache=cache_d, cache_pos=written + 1 + i,
                    kv_valid=win_valid(valid, written, 1 + i),
                    positions=(pos0 + 1 + i)[:, None], media_counts=media)
                lg = lg[:, -1]
                nxt = sample_rows(jax.random.fold_in(kd, i + 1), lg,
                                  do_sample=do_sample,
                                  temperature=temperature, top_k=top_k,
                                  top_p=top_p)
                return (nxt, cache_d), (nxt, proc_rows(lg, temperature,
                                                       top_k, top_p))

            if g > 1:
                (_, cache_d), (d_rest, q_rest) = jax.lax.scan(
                    draft_step, (d1, cache_d), jnp.arange(g - 1))
                d = jnp.concatenate([d1[:, None],
                                     jnp.moveaxis(d_rest, 0, 1)], 1)
                q = jnp.concatenate([q1[:, None],
                                     jnp.moveaxis(q_rest, 0, 1)], 1)
            else:
                d, q = d1[:, None], q1[:, None]        # [B,g], [B,g,V]

            # target verify: [toks, d_1..d_g] in ONE s=g+1 window
            window = jnp.concatenate([toks[:, None], d], 1)
            lg_t, cache, _ = self.model.apply(
                params, None, window, vis_latents=latents, cache=cache,
                cache_pos=written, kv_valid=win_valid(valid, written, g),
                positions=pos0[:, None] + jnp.arange(g + 1)[None, :],
                media_counts=media)
            wcols = written[:, None] + jnp.arange(g + 1)[None, :]
            buffer = buffer.at[rows[:, None], wcols].set(window)

            # row-gated sequence bans per window position
            for ci, (ngram, bad_words) in enumerate(lp_configs):
                genc = GenerationConfig(no_repeat_ngram_size=ngram,
                                        bad_words_ids=bad_words)
                proc = jnp.stack(
                    [sampling.process_logits(lg_t[:, j], buffer,
                                             written + 1 + j, genc,
                                             valid_from)
                     for j in range(g + 1)], 1)
                lg_t = jnp.where((lp_idx == ci)[:, None, None], proc,
                                 lg_t)

            idx = jnp.arange(g + 1)
            t_arg = jnp.argmax(lg_t, -1).astype(jnp.int32)   # [B, g+1]
            # greedy accept: agreeing prefix + the target's correction
            m_g = jnp.sum(jnp.cumprod(
                (t_arg[:, :g] == d).astype(jnp.int32), 1), 1)
            out_g = jnp.where(idx[None] < m_g[:, None],
                              jnp.concatenate([d, d[:, -1:]], 1), t_arg)
            # sampled accept: batched accept_resample
            V = lg_t.shape[-1]
            p = proc_rows(lg_t.reshape(B * (g + 1), V),
                          jnp.repeat(temperature, g + 1),
                          jnp.repeat(top_k, g + 1),
                          jnp.repeat(top_p, g + 1)).reshape(B, g + 1, V)
            ku, kr = jax.random.split(ka)
            u = jax.random.uniform(ku, (B, g), jnp.float32)
            p_at = jnp.take_along_axis(p[:, :g], d[..., None], -1)[..., 0]
            q_at = jnp.maximum(
                jnp.take_along_axis(q, d[..., None], -1)[..., 0], 1e-20)
            acc = (u < p_at / q_at).astype(jnp.int32)
            m_s = jnp.sum(jnp.cumprod(acc, 1), 1)
            p_m = jnp.take_along_axis(p, m_s[:, None, None], 1)[:, 0]
            q_m = jnp.where(
                (m_s < g)[:, None],
                jnp.take_along_axis(q, jnp.minimum(m_s, g - 1)[:, None,
                                                               None],
                                    1)[:, 0], 0.0)
            resid = jnp.maximum(p_m - q_m, 0.0)
            rs = jnp.sum(resid, -1, keepdims=True)
            resid = jnp.where(rs > 1e-6,
                              resid / jnp.maximum(rs, 1e-20), p_m)
            x_m = jax.random.categorical(
                kr, jnp.log(jnp.maximum(resid, 1e-38)), -1)
            out_s = jnp.concatenate(
                [d, jnp.zeros((B, 1), d.dtype)],
                1).at[rows, m_s].set(x_m.astype(d.dtype))

            out = jnp.where(do_sample[:, None], out_s, out_g)
            e = jnp.where(do_sample, m_s, m_g) + 1
            # truncate at eos, then at the per-row max_new budget
            eos_at = jnp.min(jnp.where(out == eos[:, None], idx[None],
                                       g + 1), 1)
            e = jnp.minimum(e, eos_at + 1)
            e = jnp.minimum(e, max_new - emitted)
            e = jnp.where(alive, e, 0)

            valid = valid | ((cols >= written[:, None])
                             & (cols < (written + e)[:, None]))
            written2 = written + e
            emitted2 = emitted + e
            eos_hit = jnp.any((out == eos[:, None])
                              & (idx[None] < e[:, None]), 1)
            alive2 = (alive & ~eos_hit & (emitted2 < max_new)
                      & (written2 + g_max + 1 <= L))
            # device-side carried state (like the plain decode step):
            # round t+1 dispatches from round t's DEVICE outputs, so the
            # (out, e) readback overlaps the next round's compute
            toks2 = jnp.where(e > 0,
                              out[rows, jnp.maximum(e - 1, 0)], toks)
            return (out, e, toks2, alive2, written2, emitted2, cache,
                    cache_d, buffer, valid)

        self._spec_fns[key] = jax.jit(spec, donate_argnums=(2, 3, 4, 5))
        return self._spec_fns[key]

    # ── acceptance-adaptive mode controller ───────────────────────────

    def _modes_ladder(self) -> List[Any]:
        """Candidate modes: the gamma ladder {gamma, gamma//2, ...} (at
        most two spec tiers, bounding compile count) + plain decode."""
        modes: List[Any] = [("spec", self.gamma)]
        if self.gamma >= 2:
            modes.append(("spec", max(1, self.gamma // 2)))
        modes.append("plain")
        return modes

    def _next_mode(self) -> Any:
        if not self.spec_adaptive:
            return ("spec", self.gamma)
        if self._probe_plan:
            return self._probe_plan.pop(0)
        return self._mode_now

    def _note_iter_time(self, mode) -> None:
        """EMA of wall seconds/iteration per mode. With pipeline_depth=1
        each scheduler iteration blocks on the previous round's
        readback, so steady-state inter-dispatch intervals track the
        device round time. Samples are only taken between consecutive
        same-mode iterations (mode switches and admissions reset)."""
        now = time.monotonic()
        if self._last_mode == mode and self._t_last_iter is not None:
            dt = now - self._t_last_iter
            prev = self._iter_times.get(mode)
            self._iter_times[mode] = dt if prev is None \
                else 0.8 * prev + 0.2 * dt
        self._t_last_iter = now
        self._last_mode = mode

    def _mode_rate(self, mode) -> Optional[float]:
        """Estimated committed tokens/sec/row for a mode, None if
        unmeasured."""
        t = self._iter_times.get(mode)
        if t is None:
            return None
        if mode == "plain":
            return 1.0 / t
        e = self._accept_ema.get(mode[1])
        return None if e is None else e / t

    def _maybe_replan(self) -> None:
        """Every 32 drained iterations: probe unmeasured candidate modes
        (8 iterations each — probing is output-exact, it costs only
        throughput), then switch to the fastest measured mode with 5%
        hysteresis. Suspended modes' acceptance estimates age; re-probe
        them every 1024 iterations so drift (alpha rises as requests
        condition on their own text; admissions change the mix) is
        picked up."""
        if not self.spec_adaptive or self._probe_plan:
            return
        self._ctrl_count += 1
        self._stale_count += 1
        if self._ctrl_count % self._replan_every:
            return
        modes = self._modes_ladder()
        rates = {m: self._mode_rate(m) for m in modes}
        unknown = [m for m in modes if rates[m] is None]
        if unknown:
            self._probe_plan.extend([unknown[0]] * self._probe_len)
            return
        if self._stale_count >= self._stale_every:
            self._stale_count = 0
            for m in modes:
                if m != self._mode_now:
                    self._probe_plan.extend([m] * self._probe_len)
            return
        best = max(modes, key=lambda m: rates[m])
        if best != self._mode_now \
                and rates[best] > 1.05 * rates[self._mode_now]:
            self._mode_now = best

    def _get_catchup(self):
        """Draft-cache catch-up after plain-mode iterations: re-ingest
        each row's last `W` GENERATED columns (floor-clamped to the
        first decode column, so prompt/media columns — already cached by
        the admission ingest — are never touched) through the draft's
        s>1 decode path. Re-ingesting already-cached columns recomputes
        identical K/V (idempotent); columns at/after `written` hold
        junk that the next round's verify window overwrites before
        marking valid. Gaps older than W stay holes: the draft then
        proposes from partial context, which costs acceptance, never
        correctness (verification corrects any proposal)."""
        if self._catchup_fn is None:
            W = min(256, self.L)

            def catchup(params_d, cache_d, buffer, valid, latents_d,
                        written, floor, valid_from, media):
                start = jnp.maximum(written - W, floor)
                cols = start[:, None] + jnp.arange(W)[None]
                toks = jnp.take_along_axis(
                    buffer, jnp.minimum(cols, self.L - 1), 1)
                positions = jnp.maximum(cols - valid_from[:, None], 0)
                _, cache_d, _ = self.model_d.apply(
                    params_d, None, toks, vis_latents=latents_d,
                    cache=cache_d, cache_pos=start, kv_valid=valid,
                    positions=positions.astype(jnp.int32),
                    media_counts=media)
                return cache_d

            self._catchup_fn = jax.jit(catchup, donate_argnums=(1,))
        return self._catchup_fn

    def _run_catchup(self) -> None:
        st = self._statics
        floor = jnp.asarray([s.bucket for s in self._slots], jnp.int32)
        self._cache_d = self._get_catchup()(
            self.params_d, self._cache_d, self._buffer, self._valid,
            self._latents_d, self._carried["written"], floor,
            st["valid_from"], st["media"])

    def _step_spec(self) -> bool:
        """One speculative scheduler iteration: dispatch a round with NO
        host sync (carried slot state flows device-to-device, exactly
        like `_dispatch`), then drain pipelined rounds — each readback
        covers up to gamma+1 tokens per row AND overlaps the next
        round's compute. The adaptive controller may route iterations
        to plain decode (mode "plain") or a smaller gamma instead."""
        slots = self._slots
        if not any(s.active for s in slots):
            self._drain_all()
            return False
        if self._dirty or self._carried is None:
            self._lp_list, self._statics = self._static_args(slots)
            self._carried = self._carried_args(slots)
            self._dirty = False
            self._t_last_iter = None
        mode = self._next_mode()
        self._note_iter_time(mode)
        if mode == "plain":
            self._draft_stale = True
            res = self._dispatch(need_logits=False)
            self._inflight.append(
                (res[0], [i for i, s in enumerate(slots) if s.active],
                 "plain"))
            while len(self._inflight) > self.pipeline_depth:
                self._drain_one()
            return True
        g = mode[1]
        if self._draft_stale:
            self._run_catchup()
            self._draft_stale = False
        self._rng, sub = jax.random.split(self._rng)
        st, ca = self._statics, self._carried
        (out, e, toks2, alive2, written2, emitted2, self._cache,
         self._cache_d, self._buffer, self._valid) = \
            self._get_spec_round(self._lp_list, g)(
                self.params, self.params_d, self._cache, self._cache_d,
                self._buffer, self._valid, self._latents,
                self._latents_d, ca["toks"], ca["alive"], ca["written"],
                ca["emitted"], st["real_len"], st["media"],
                st["lp_idx"], st["valid_from"], st["do_sample"],
                st["temperature"], st["top_k"], st["top_p"], st["eos"],
                st["max_new"], sub)
        self._carried = dict(toks=toks2, alive=alive2, written=written2,
                             emitted=emitted2)
        self._inflight.append(
            ((out, e), [i for i, s in enumerate(slots) if s.active],
             ("spec", g)))
        while len(self._inflight) > self.pipeline_depth:
            self._drain_one()
        return True

    def _drain_one_spec(self, entry):
        """Force the oldest in-flight ROUND's (out, e) and stream each
        row's emitted prefix, mirroring the device's alive2 rules
        (eos / max_new budget / gamma+1 cache-room stop) on the host
        slot state."""
        (out_dev, e_dev), snapshot, mode = entry
        out = np.asarray(out_dev)
        e = np.asarray(e_dev)
        # acceptance accounting: pool-mean committed tokens this round
        # (capped rows — eos/max_new truncation — still reflect real
        # acceptance closely enough for control) + per-slot EMA
        g = mode[1]
        live = [i for i in snapshot if self._slots[i].active]
        if live:
            mean_e = float(np.mean([e[i] for i in live]))
            prev = self._accept_ema.get(g)
            self._accept_ema[g] = mean_e if prev is None \
                else 0.8 * prev + 0.2 * mean_e
            for i in live:
                s = self._slots[i]
                s.accept_ema = (float(e[i]) if s.accept_ema is None
                                else 0.8 * s.accept_ema + 0.2 * float(e[i]))
        self._maybe_replan()
        for i in snapshot:
            s = self._slots[i]
            if not s.active:
                continue
            eos = s.gen.eos_token_id if s.gen.eos_token_id is not None \
                else self.cfg.eoc_token_id
            closed = False
            for tok in out[i, : int(e[i])]:
                tok = int(tok)
                s.written += 1
                s.emitted += 1
                if tok == eos:
                    s.out.put(None)
                    self._finish(s)
                    closed = True
                    break
                s.out.put(tok)
                s.last_tok = tok
            if not closed and (s.emitted >= s.gen.max_new_tokens
                               or s.written + self.gamma + 1 > self.L):
                s.out.put(None)
                self._finish(s)

    # ── beam-group jitted pieces ──────────────────────────────────────

    def _get_beam_cand(self, k: int):
        """Top-2k candidate selection over the group rows' logits."""
        if k not in self._beam_cand_fns:
            def cand(logits, rows, scores):
                lp = jax.nn.log_softmax(
                    logits[rows].astype(jnp.float32), axis=-1)  # [k, V]
                vocab = lp.shape[-1]
                total = scores[:, None] + lp
                top, idx = jax.lax.top_k(total.reshape(-1), 2 * k)
                return top, idx // vocab, idx % vocab
            self._beam_cand_fns[k] = jax.jit(cand)
        return self._beam_cand_fns[k]

    def _get_beam_reorder(self):
        """Gather parent-beam rows into the group's slot rows for every
        pooled array (cache k/v/scales, token buffer, valid mask) —
        latents are identical across the group and skipped."""
        if self._beam_reorder_fn is None:
            def reorder(cache, buffer, valid, rows, parents):
                cache = {key: v.at[rows].set(v[parents])
                         for key, v in cache.items()}
                buffer = buffer.at[rows].set(buffer[parents])
                valid = valid.at[rows].set(valid[parents])
                return cache, buffer, valid
            self._beam_reorder_fn = jax.jit(reorder,
                                            donate_argnums=(0, 1, 2))
        return self._beam_reorder_fn

    # ── scheduler ─────────────────────────────────────────────────────

    def _admit_start(self, vision_x, lang_x, gen, out,
                     t_submit: float = 0.0):
        """Dispatch one admission (prefill + slot insert + first-token
        sample) WITHOUT any device->host sync; returns (slot, device_tok).
        `_admit` forces all admitted first tokens in ONE readback so K
        admissions pipeline their prefills instead of each paying the
        relay roundtrip (and stalling every active decode stream)."""
        if gen.num_beams > 1:
            return self._admit_start_beam(vision_x, lang_x, gen, out,
                                          t_submit)
        free = next((i for i, s in enumerate(self._slots)
                     if not s.active and not s.pending), None)
        assert free is not None
        lang_x = np.asarray(lang_x)
        real = int(lang_x.shape[1])
        bucket = _round_bucket(real, self.buckets)
        ids, mask = left_pad(lang_x, None, target_len=bucket,
                             pad_id=gen.pad_token_id)
        last_logits, small, lat = self._get_prefill(bucket)(
            self.params, jnp.asarray(vision_x), jnp.asarray(ids),
            jnp.asarray(mask))
        if self._latents is None:
            shape = (self.n, self.max_media) + tuple(lat.shape[2:])
            self._latents = jnp.zeros(shape, lat.dtype)

        self._cache, self._buffer, self._valid, self._latents = \
            self._get_insert(bucket)(
                self._cache, small, self._buffer, self._valid,
                self._latents, free, jnp.asarray(ids[0]),
                jnp.asarray(mask[0]), lat)
        if self.model_d is not None:
            self._admit_draft(bucket, vision_x, ids, mask, free)

        # first token from the prefill logits (left on device)
        self._rng, sub = jax.random.split(self._rng)
        first_logits = last_logits
        if gen.no_repeat_ngram_size or gen.bad_words_ids:
            first_logits = sampling.process_logits(
                first_logits, jnp.asarray(ids), bucket, gen,
                bucket - real)
        tok_dev = sampling.sample_token(
            sub, first_logits, do_sample=gen.do_sample,
            temperature=gen.temperature, top_k=gen.top_k,
            top_p=gen.top_p)[0]

        slot = self._slots[free]
        slot.gen = gen
        slot.out = out
        slot.real_len = real
        slot.bucket = bucket
        slot.written = bucket
        slot.emitted = 1
        slot.media = int(np.sum(lang_x == self.cfg.media_token_id))
        # pending, NOT active: the slot joins the decode pool when the
        # finisher thread lands its first token (`_collect_admitted`);
        # until then decode iterations exclude the row (its speculative
        # cache/buffer writes are overwritten by the first real step)
        slot.pending = True
        slot.active = False
        slot.t_submit = t_submit
        return slot, tok_dev

    def _admit_draft(self, bucket, vision_x, ids, mask, free):
        """Draft half of an admission: prefill the draft on the same
        padded prompt and scatter its cache/latents into the draft pools
        (the shared buffer/valid rows were written by the target
        insert). The draft's first-token logits are discarded — the
        round-opening token always comes from the TARGET prefill, like
        the standalone generator's prefill."""
        _, small_d, lat_d = self._get_prefill(bucket, "d")(
            self.params_d, jnp.asarray(vision_x), jnp.asarray(ids),
            jnp.asarray(mask))
        if self._latents_d is None:
            shape = (self.n, self.max_media) + tuple(lat_d.shape[2:])
            self._latents_d = jnp.zeros(shape, lat_d.dtype)
        self._cache_d, self._latents_d = self._get_insert_d(bucket)(
            self._cache_d, small_d, self._latents_d, free, lat_d)

    def _admit_start_beam(self, vision_x, lang_x, gen, out,
                          t_submit: float = 0.0):
        """Admit a num_beams=k request into k slots: ONE prefill, its KV
        replicated into each beam row, then a top-k fan-out over the
        prefill logits (generation/beam.py `_beam_setup` first step)."""
        k = gen.num_beams
        free = [i for i, s in enumerate(self._slots)
                if not s.active and not s.pending][:k]
        assert len(free) == k
        lang_x = np.asarray(lang_x)
        real = int(lang_x.shape[1])
        bucket = _round_bucket(real, self.buckets)
        ids, mask = left_pad(lang_x, None, target_len=bucket,
                             pad_id=gen.pad_token_id)
        last_logits, small, lat = self._get_prefill(bucket)(
            self.params, jnp.asarray(vision_x), jnp.asarray(ids),
            jnp.asarray(mask))
        if self._latents is None:
            shape = (self.n, self.max_media) + tuple(lat.shape[2:])
            self._latents = jnp.zeros(shape, lat.dtype)
        for row in free:
            self._cache, self._buffer, self._valid, self._latents = \
                self._get_insert(bucket)(
                    self._cache, small, self._buffer, self._valid,
                    self._latents, row, jnp.asarray(ids[0]),
                    jnp.asarray(mask[0]), lat)

        logits0 = last_logits[0]
        if gen.no_repeat_ngram_size or gen.bad_words_ids:
            logits0 = sampling.process_logits(
                logits0[None], jnp.asarray(ids), bucket, gen,
                bucket - real)[0]
        logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32))
        first_scores, first_toks = jax.lax.top_k(logp0, k)

        gid = self._next_group
        self._next_group += 1
        grp = _BeamGroup(gen=gen, out=out, rows=list(free), gid=gid,
                         t_submit=t_submit)
        self._groups[gid] = grp
        media = int(np.sum(lang_x == self.cfg.media_token_id))
        for row in free:
            s = self._slots[row]
            s.gen = gen
            s.out = None            # delivery goes through the group
            s.real_len = real
            s.bucket = bucket
            s.written = bucket
            s.emitted = 1
            s.media = media
            s.active = True
            s.group = gid
            s.t_submit = t_submit
        return grp, (first_toks, first_scores)

    def _admit_finish(self, slot, tok):
        if isinstance(slot, _BeamGroup):
            return self._admit_finish_beam(slot, tok)
        return self._admit_finish_slot(slot, int(tok))

    def _admit_finish_beam(self, grp: "_BeamGroup", dev):
        toks = np.asarray(dev[0])
        scores = np.asarray(dev[1], np.float32)
        gen = grp.gen
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg.eoc_token_id
        neg_inf = np.float32(-1e9)
        live = np.where(toks == eos, neg_inf, scores)
        for t, s in zip(toks, scores):
            if int(t) == eos:
                # a 1-token finished hypothesis (empty visible text)
                grp.fin.append((float(s) / (1.0 ** gen.length_penalty),
                                []))
        grp.scores = live
        grp.hyps = [[int(t)] for t in toks]
        now = time.monotonic()
        for i, row in enumerate(grp.rows):
            s = self._slots[row]
            s.last_tok = int(toks[i])
            s.t_admit = s.t_first = now
        if gen.max_new_tokens <= 1 or bool(np.all(live <= neg_inf)):
            self._finalize_group(grp)

    def _admit_finish_slot(self, slot: "_Slot", tok: int):
        gen, out = slot.gen, slot.out
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg.eoc_token_id
        slot.last_tok = tok
        slot.t_admit = slot.t_first = time.monotonic()
        if tok == eos or gen.max_new_tokens <= 1:
            if tok != eos:
                out.put(tok)
            out.put(None)
            self._finish(slot)
        else:
            out.put(tok)

    def _beam_advance(self, grp: "_BeamGroup", logits_dev):
        """One beam step for a group: top-2k candidates over the group
        rows' processed logits (device), then host-side finished/live
        bookkeeping and a device gather that reorders the group's
        cache/buffer rows to the selected parent beams (HF semantics,
        mirroring generation/beam.py `body`)."""
        k = len(grp.rows)
        gen = grp.gen
        rows_dev = jnp.asarray(grp.rows, jnp.int32)
        top, beams, toks = self._get_beam_cand(k)(
            logits_dev, rows_dev, jnp.asarray(grp.scores))
        top = np.asarray(top)
        beams = np.asarray(beams)
        toks = np.asarray(toks)
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else self.cfg.eoc_token_id
        cur_len = len(grp.hyps[0]) + 1

        def pen(score, length):
            return float(score) / (float(length) ** gen.length_penalty)

        live: List[Tuple[float, int, int]] = []
        for s, b, t in zip(top, beams, toks):
            if int(t) == eos:
                # hypothesis delivered WITHOUT the eos (submit contract)
                grp.fin.append((pen(s, cur_len), list(grp.hyps[int(b)])))
            elif len(live) < k:
                live.append((float(s), int(b), int(t)))
        grp.fin = sorted(grp.fin, key=lambda x: x[0], reverse=True)[:k]

        parents_abs = [grp.rows[b] for _, b, _ in live]
        if parents_abs != grp.rows:
            self._cache, self._buffer, self._valid = \
                self._get_beam_reorder()(
                    self._cache, self._buffer, self._valid, rows_dev,
                    jnp.asarray(parents_abs, jnp.int32))
        grp.hyps = [grp.hyps[b] + [t] for _, b, t in live]
        grp.scores = np.asarray([s for s, _, _ in live], np.float32)
        emitted = 0
        for i, row in enumerate(grp.rows):
            s = self._slots[row]
            s.written += 1
            s.emitted += 1
            s.last_tok = live[i][2]
            emitted = s.emitted
        max_len_hit = (emitted >= gen.max_new_tokens
                       or self._slots[grp.rows[0]].written >= self.L)
        if max_len_hit or (gen.early_stopping and len(grp.fin) >= k):
            self._finalize_group(grp)

    def _finalize_group(self, grp: "_BeamGroup"):
        """Pick the best hypothesis (finished pool vs length-penalized
        live beams), deliver its tokens, free the group's slots."""
        gen = grp.gen
        cands = list(grp.fin)
        for score, hyp in zip(grp.scores, grp.hyps):
            if score > -1e8:
                cands.append(
                    (float(score) / (float(len(hyp))
                                     ** gen.length_penalty), list(hyp)))
        best = max(cands, key=lambda x: x[0])[1] if cands else []
        for tok in best:
            grp.out.put(int(tok))
        grp.out.put(None)
        for i, row in enumerate(grp.rows):
            s = self._slots[row]
            if i == 0:
                self._finish(s)      # one latency record per request
            else:
                s.active = False
            s.group = None
        self._groups.pop(grp.gid, None)

    def _finish(self, slot: "_Slot"):
        """Close out a request and record its latency stats."""
        slot.active = False
        now = time.monotonic()
        decode_s = max(now - slot.t_first, 1e-9)
        with self._lock:
            self._completed.append({
                "prompt_tokens": slot.real_len,
                "new_tokens": slot.emitted,
                "ttft_s": (slot.t_first - slot.t_submit
                           if slot.t_submit else 0.0),
                "queue_s": (slot.t_admit - slot.t_submit
                            if slot.t_submit else 0.0),
                "decode_tok_s": (slot.emitted - 1) / decode_s,
                "total_s": now - (slot.t_submit or slot.t_first),
            })
            if len(self._completed) > 1024:
                del self._completed[: len(self._completed) - 1024]

    def stats(self) -> dict:
        """Aggregate serving metrics: queue depth, active slots, and
        percentiles over the completed-request latency records (the
        per-slot observability the reference's semaphore worker lacks)."""
        with self._lock:
            records = list(self._completed)
            active = sum(s.active for s in self._slots)
        out = {
            "active_slots": active,
            "num_slots": self.n,
            "queue_depth": self._pending.qsize(),
            "completed": len(records),
        }
        if self.model_d is not None:
            out["spec"] = {
                "adaptive": self.spec_adaptive,
                "mode": ("plain" if self._mode_now == "plain"
                         else f"spec_gamma{self._mode_now[1]}"),
                "accept_ema_tok_per_round": dict(self._accept_ema),
                "iter_time_ema_s": {
                    ("plain" if m == "plain" else f"spec_gamma{m[1]}"): t
                    for m, t in self._iter_times.items()},
                "slot_accept_ema": [s.accept_ema for s in self._slots],
            }
        if records:
            ttfts = sorted(r["ttft_s"] for r in records)
            rates = sorted(r["decode_tok_s"] for r in records)

            def pct(xs, p):
                return xs[min(len(xs) - 1, int(p * len(xs)))]

            out.update({
                "ttft_p50_s": pct(ttfts, 0.5),
                "ttft_p90_s": pct(ttfts, 0.9),
                "decode_tok_s_p50": pct(rates, 0.5),
                "recent": records[-8:],
            })
        return out

    def _admit(self):
        decoding = any(s.active for s in self._slots)
        started = []
        n_started = 0

        def free_count():
            return sum(not s.active and not s.pending
                       for s in self._slots)

        def try_start(item) -> bool:
            nonlocal n_started
            gen = item[2]
            need = max(1, gen.num_beams)
            if need > free_count():
                return False
            C = self.prefill_chunk
            if C and gen.num_beams <= 1:
                bucket = _round_bucket(int(np.asarray(item[1]).shape[1]),
                                       self.buckets)
                if bucket > C and bucket % C == 0:
                    self._chunk_begin(*item)
                    n_started += 1
                    return True
            started.append(self._admit_start(*item))
            n_started += 1
            return True

        # beam requests blocked on slot availability earlier get first
        # crack; smaller requests may backfill around a blocked one
        still = []
        for item in self._deferred:
            if (decoding and n_started >= self.max_admits_per_iter) \
                    or not try_start(item):
                still.append(item)
        self._deferred = still
        while not self._pending.empty():
            if decoding and n_started >= self.max_admits_per_iter:
                break
            if free_count() == 0:
                break
            try:
                item = self._pending.get_nowait()
            except queue.Empty:
                break
            if not try_start(item):
                self._deferred.append(item)
        # dispatch-then-force: all K prefills are already in flight
        # (pipelined on device). Single-stream first tokens are forced
        # on the FINISHER thread (each force is a full relay roundtrip;
        # on the scheduler thread it stalled every active decode stream)
        # — the queue preserves dispatch order so request 1's TTFT stays
        # at its own prefill latency. Beam groups keep the inline force:
        # their host-side beam state must exist before the next _step
        # treats the group as sync.
        for slot, tok_dev in started:
            if isinstance(slot, _BeamGroup):
                self._admit_finish(slot, tok_dev)
            else:
                self._force_q.put((slot, tok_dev))

    def _static_args(self, slots):
        """Per-admission host-built arrays + the distinct lp configs —
        constant between admissions, rebuilt when `_dirty`."""
        def arr(fn, dtype):
            return jnp.asarray([fn(s) for s in slots], dtype)

        lp_list: List[Tuple[int, Any]] = []
        lp_idx = []
        for s in slots:
            if s.active and s.gen and (s.gen.no_repeat_ngram_size
                                       or s.gen.bad_words_ids):
                c = (s.gen.no_repeat_ngram_size, s.gen.bad_words_ids)
                if c not in lp_list:
                    lp_list.append(c)
                lp_idx.append(lp_list.index(c))
            else:
                lp_idx.append(-1)
        return tuple(lp_list), dict(
            real_len=arr(lambda s: s.real_len, jnp.int32),
            media=arr(lambda s: s.media, jnp.int32),
            lp_idx=jnp.asarray(lp_idx, jnp.int32),
            valid_from=arr(lambda s: s.bucket - s.real_len, jnp.int32),
            do_sample=arr(lambda s: bool(s.gen.do_sample)
                          if s.gen else False, bool),
            temperature=arr(lambda s: s.gen.temperature if s.gen
                            and s.gen.do_sample and s.gen.temperature > 0
                            else 1.0, jnp.float32),
            top_k=arr(lambda s: s.gen.top_k if s.gen else 0, jnp.int32),
            top_p=arr(lambda s: s.gen.top_p if s.gen else 1.0,
                      jnp.float32),
            eos=arr(lambda s: (s.gen.eos_token_id
                               if s.gen and s.gen.eos_token_id is not None
                               else self.cfg.eoc_token_id), jnp.int32),
            max_new=arr(lambda s: s.gen.max_new_tokens if s.gen else 0,
                        jnp.int32))

    def _carried_args(self, slots):
        return dict(
            toks=jnp.asarray([s.last_tok for s in slots], jnp.int32),
            alive=jnp.asarray([s.active for s in slots], bool),
            written=jnp.asarray([s.written for s in slots], jnp.int32),
            emitted=jnp.asarray([s.emitted for s in slots], jnp.int32))

    def _dispatch(self, need_logits: bool):
        """Dispatch one decode iteration with NO host sync; returns the
        device results. Carried slot state (toks/alive/written/emitted)
        flows device-to-device between iterations, so in steady state
        the relay readback of iteration t overlaps iteration t+1's
        compute (the r2 design forced every token before the next
        dispatch: one full roundtrip per iteration on the critical
        path)."""
        slots = self._slots
        if self._dirty or self._carried is None:
            self._lp_list, self._statics = self._static_args(slots)
            self._carried = self._carried_args(slots)
            self._dirty = False
        self._rng, sub = jax.random.split(self._rng)
        st, ca = self._statics, self._carried
        res = self._get_decode(self._lp_list, need_logits)(
            self.params, self._cache, self._buffer, self._valid,
            self._latents, ca["toks"], ca["alive"], ca["written"],
            ca["emitted"], st["real_len"], st["media"], st["lp_idx"],
            st["valid_from"], st["do_sample"], st["temperature"],
            st["top_k"], st["top_p"], st["eos"], st["max_new"], sub)
        (nxt, alive2, written2, emitted2, self._cache, self._buffer,
         self._valid) = res[:7]
        self._carried = dict(toks=nxt, alive=alive2, written=written2,
                             emitted=emitted2)
        return res

    def _drain_one(self):
        """Force the oldest in-flight iteration's tokens and stream them
        (host mirrors of written/emitted/active advance exactly like the
        device-side update in `decode`). Entries are (payload, snapshot,
        kind): spec-pool rounds carry kind ("spec", gamma) and plain
        iterations (draft-free pools AND the adaptive controller's
        plain-mode iterations) carry "plain"."""
        entry = self._inflight.pop(0)
        if entry[-1] != "plain":
            return self._drain_one_spec(entry)
        nxt_dev, snapshot, _ = entry
        if self.model_d is not None:
            self._maybe_replan()   # controller advances in plain mode too
        toks = np.asarray(nxt_dev)
        for i in snapshot:
            s = self._slots[i]
            if not s.active or s.group is not None:
                continue
            tok = int(toks[i])
            eos = s.gen.eos_token_id if s.gen.eos_token_id is not None \
                else self.cfg.eoc_token_id
            s.written += 1
            s.emitted += 1
            if tok == eos:
                s.out.put(None)
                self._finish(s)
            elif s.emitted >= s.gen.max_new_tokens \
                    or s.written >= self.L:
                s.out.put(tok)
                s.out.put(None)
                self._finish(s)
            else:
                s.out.put(tok)
                s.last_tok = tok

    def _drain_all(self):
        while self._inflight:
            self._drain_one()

    def _step(self):
        if self.model_d is not None:
            # speculative rounds: pipelined like plain decode, with each
            # (out, e) readback amortized over up to gamma+1 tokens per
            # row; beams never coexist with a draft (submit caps
            # num_beams to 1)
            return self._step_spec()
        if self._groups:
            # beam groups force a host sync per iteration (top-2k
            # readback + conditional reorder): run unpipelined
            self._drain_all()
            return self._step_sync()
        if not any(s.active for s in self._slots):
            self._drain_all()
            return False
        res = self._dispatch(need_logits=False)
        self._inflight.append(
            (res[0], [i for i, s in enumerate(self._slots) if s.active],
             "plain"))
        while len(self._inflight) > self.pipeline_depth:
            self._drain_one()
        return True

    def _step_sync(self):
        slots = self._slots
        if not any(s.active for s in slots):
            return False
        res = self._dispatch(need_logits=True)
        logits_dev = res[7]
        for grp in list(self._groups.values()):
            self._beam_advance(grp, logits_dev)
        self._inflight.append(
            (res[0], [i for i, s in enumerate(slots) if s.active],
             "plain"))
        self._drain_all()
        # beam bookkeeping rewrote host slot state: rebuild carried
        self._dirty = True
        return any(s.active for s in slots)

    def _loop(self):
        # a scheduler-thread exception must FAIL every stream, not
        # silently kill the thread and leave consumers blocked on their
        # queues forever (observed: a prefill-fn TypeError hung the
        # suite with zero diagnostics)
        try:
            self._loop_inner()
        except BaseException as e:   # noqa: BLE001 - surfaced to streams
            self._failure = e
            self._fail_streams(e)

    def _fail_streams(self, exc):
        sent = _SchedulerError(exc)
        outs = []
        with self._lock:
            outs += [s.out for s in self._slots if s.out is not None]
            outs += [g.out for g in getattr(self, "_groups", {}).values()
                     if g.out is not None]
            outs += [t["out"] for t in self._chunk_tasks
                     + self._ready_chunked if t.get("out") is not None]
            outs += [d[3] for d in self._deferred]
        while True:
            try:
                outs.append(self._pending.get_nowait()[3])
            except queue.Empty:
                break
        for out in outs:
            out.put(sent)

    def _loop_inner(self):
        while not self._stop:
            if (not self._pending.empty() or self._deferred
                    or self._finished or self._ready_chunked):
                # admissions mutate pooled state and reuse freed slots:
                # drain in-flight iterations first (frees slots, restores
                # the host view), then activate finished admissions and
                # insert new ones
                self._drain_all()
                self._collect_admitted()
                self._finalize_chunked()
                self._admit()
                self._dirty = True
            busy = self._step()
            # one prefill chunk per in-flight chunked admission rides
            # after each decode iteration: the device interleaves them,
            # bounding every stream's stall at one chunk's compute
            self._advance_chunked()
            if (not busy and self._pending.empty() and not self._deferred
                    and not self._finished and not self._chunk_tasks
                    and not self._ready_chunked):
                # pending-only states park here too: the finisher sets
                # _work when a first token lands (worst case the 0.2 s
                # timeout covers a lost wakeup)
                self._drain_all()
                self._work.clear()
                self._work.wait(timeout=0.2)
