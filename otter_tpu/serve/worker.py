"""Model worker: hosts the jitted generation engine behind the streaming
HTTP protocol of the reference worker (`pipeline/serve/model_worker.py`):

  - registers with the controller and heartbeats every WORKER_HEART_BEAT
    seconds (model_worker.py:44-52,120-155)
  - /worker_generate_stream: base64 images -> vision_x (B,T,F,C,H,W)
    (:181-206; a list-of-lists means one video, frames along F) ->
    streaming decode -> `\\0`-delimited JSON {"text": cumulative,
    "error_code": 0} chunks (:251-263)
  - /worker_get_status (:164-168); concurrency semaphore (:156-160)

The decode loop is otter_tpu's jitted streaming engine instead of a
threaded HF generate + TextIteratorStreamer.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
import uuid
from typing import Callable, Iterator, List, Optional

import numpy as np

WORKER_HEART_BEAT_INTERVAL = 15
SERVER_ERROR_MSG = ("**NETWORK ERROR DUE TO HIGH TRAFFIC. PLEASE REGENERATE "
                    "OR REFRESH THIS PAGE.**")


def decode_media_to_vision_x(images, patch_size: int = 224,
                             mean=None, std=None):
    """Mixed media -> (vision_x [1, T, F, C, H, W], frame_mask [1, T, F]).

    Each list element is a base64 still OR a list of base64 frames (one
    video). Stills stack along T with F=1; videos contribute all their
    frames along F. Mixing works: shorter items are zero-padded along F
    and masked out of the perceiver attention. Strictly more capable than
    the reference worker, which keeps only the LAST video
    (model_worker.py:184-186 `images = images[-1]`)."""
    from otter_tpu.data.mimicit import preprocess_image
    from otter_tpu.data import templates
    from PIL import Image
    if not images:
        return None, None
    mean = mean or templates.FLAMINGO_MEAN
    std = std or templates.FLAMINGO_STD

    def dec(b64):
        img = Image.open(io.BytesIO(
            base64.urlsafe_b64decode(b64))).convert("RGB")
        return preprocess_image(img, patch_size, mean, std)

    items = [[dec(f) for f in (el if isinstance(el, list) else [el])]
             for el in images]
    t = len(items)
    f = max(len(it) for it in items)
    vx = np.zeros((1, t, f) + items[0][0].shape, np.float32)
    mask = np.zeros((1, t, f), bool)
    for i, frames in enumerate(items):
        vx[0, i, : len(frames)] = np.stack(frames, 0)
        mask[0, i, : len(frames)] = True
    return vx, mask


def decode_images_to_vision_x(images, patch_size: int = 224,
                              mean=None, std=None) -> Optional[np.ndarray]:
    """Back-compat wrapper returning only vision_x."""
    vx, _ = decode_media_to_vision_x(images, patch_size, mean, std)
    return vx


class ModelWorker:
    def __init__(self, *, controller_addr: str, worker_addr: str,
                 model_name: str,
                 stream_fn: Callable[[dict], Iterator[str]],
                 limit_model_concurrency: int = 5,
                 no_register: bool = False):
        """stream_fn(params) yields cumulative generated text."""
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.worker_id = str(uuid.uuid4())[:6]
        self.model_name = model_name
        self.stream_fn = stream_fn
        self.limit = limit_model_concurrency
        self._active = 0
        self._lock = threading.Lock()
        if not no_register:
            self.register_to_controller()
            self.heart_beat_thread = threading.Thread(
                target=self._heartbeat_loop, daemon=True)
            self.heart_beat_thread.start()

    # ── controller interaction ──────────────────────────────────────

    def register_to_controller(self):
        import requests
        requests.post(self.controller_addr + "/register_worker", json={
            "worker_name": self.worker_addr,
            "check_heart_beat": True,
            "worker_status": self.get_status(),
        }, timeout=10)

    def _heartbeat_loop(self):
        import requests
        while True:
            time.sleep(WORKER_HEART_BEAT_INTERVAL)
            try:
                r = requests.post(
                    self.controller_addr + "/receive_heart_beat",
                    json={"worker_name": self.worker_addr,
                          "queue_length": self.get_queue_length()},
                    timeout=5)
                if not r.json().get("exist"):
                    self.register_to_controller()  # controller restarted
            except Exception:
                pass

    def get_queue_length(self) -> int:
        return max(self._active - self.limit, 0) + self._active

    def get_status(self) -> dict:
        status = {"model_names": [self.model_name], "speed": 1,
                  "queue_length": self.get_queue_length()}
        stats = getattr(self.stream_fn, "stats", None)
        if stats is not None:
            # continuous-batching workers report per-request latency
            # aggregates (TTFT/decode-rate percentiles, queue depth)
            status["batching"] = stats()
        return status

    # ── generation ──────────────────────────────────────────────────

    def generate_stream_gate(self, params: dict) -> Iterator[bytes]:
        with self._lock:
            self._active += 1
        try:
            for text in self.stream_fn(params):
                yield json.dumps(
                    {"text": text, "error_code": 0}).encode() + b"\0"
        except ValueError as e:
            yield json.dumps(
                {"text": f"{SERVER_ERROR_MSG} ({e})",
                 "error_code": 1}).encode() + b"\0"
        except Exception as e:
            yield json.dumps(
                {"text": f"{SERVER_ERROR_MSG} ({type(e).__name__})",
                 "error_code": 1}).encode() + b"\0"
        finally:
            with self._lock:
                self._active -= 1


def _parse_gen_kwargs(gk: dict):
    from otter_tpu.config import GenerationConfig
    return GenerationConfig(
        max_new_tokens=int(gk.get("max_new_tokens", 512)),
        do_sample=bool(gk.get("do_sample", False)),
        temperature=float(gk.get("temperature", 1.0)),
        top_k=int(gk.get("top_k", 0)),
        top_p=float(gk.get("top_p", 1.0)),
        num_beams=int(gk.get("num_beams", 1)),
        length_penalty=float(gk.get("length_penalty", 1.0)),
        no_repeat_ngram_size=int(gk.get("no_repeat_ngram_size", 0)),
        bad_words_ids=(tuple(tuple(int(t) for t in seq)
                             for seq in gk["bad_words_ids"])
                       if gk.get("bad_words_ids") else None),
    )


def make_batched_stream_fn(batcher, tokenizer, cfg, *,
                           stream_interval: int = 2, mean=None, std=None):
    """Streaming bridge over the ContinuousBatcher: concurrent requests
    decode in one shared step (aggregate tok/s scales with concurrency
    instead of queueing behind the reference's semaphore). mean/std select
    the family normalization (FLAMINGO default; IDEFICS for idefics)."""
    patch_size = cfg.vision.image_size

    def stream_fn(params: dict):
        import numpy as np
        prompt = params["prompt"]
        vision_x = decode_images_to_vision_x(params.get("images"),
                                             patch_size=patch_size,
                                             mean=mean, std=std)
        if vision_x is None:
            vision_x = np.zeros((1, 1, 1, 3, patch_size, patch_size),
                                np.float32)
        gen = _parse_gen_kwargs(params.get("generation_kwargs", {}))
        enc = tokenizer(prompt, return_tensors="np")
        lang_x = enc["input_ids"].astype(np.int32)
        text, pending = "", []
        for i, tok in enumerate(batcher.submit(vision_x, lang_x, gen)):
            pending.append(tok)
            if (i + 1) % stream_interval == 0:
                text += tokenizer.decode(pending, skip_special_tokens=True)
                pending = []
                yield text
        if pending:
            text += tokenizer.decode(pending, skip_special_tokens=True)
        yield text

    stream_fn.stats = batcher.stats
    return stream_fn


def make_otter_stream_fn(engine, tokenizer, cfg, *, stream_interval: int = 2,
                         sessions=None, spec=None, spec_sessions=None):
    """Bridges the HTTP params to the jitted streaming engine.

    `sessions` (a `generation.session.SessionPool`) enables the
    cross-turn KV prefix cache: a request carrying a `session_id` only
    prefills the part of the conversation the session cache does not
    already hold (falls back to the stateless engine on capacity
    overflow, beams, or masked video frames).

    `spec` (a `generation.speculative.SpeculativeGenerator`) routes
    greedy/sampled single-stream requests through draft-based
    speculative decoding (`--draft-checkpoint`); beamed or
    ngram-constrained requests fall back to the vanilla engine.

    `spec_sessions` (a SessionPool of `SpecChatSession`) composes the
    two: session-cache TTFT plus speculative per-token throughput for
    `session_id` requests. The worker builds it when BOTH
    --session-cache and --draft-checkpoint are set."""
    import jax.numpy as jnp
    from otter_tpu.config import GenerationConfig

    patch_size = cfg.vision.image_size

    def relay(token_iter) -> Iterator[str]:
        """tokens -> cumulative text chunks every `stream_interval`."""
        text, pending = "", []
        for i, tok in enumerate(token_iter):
            pending.append(tok)
            if (i + 1) % stream_interval == 0:
                text += tokenizer.decode(pending, skip_special_tokens=True)
                pending = []
                yield text
        if pending:
            text += tokenizer.decode(pending, skip_special_tokens=True)
        yield text

    def stream_fn(params: dict) -> Iterator[str]:
        prompt = params["prompt"]
        vision_x, frame_mask = decode_media_to_vision_x(
            params.get("images"), patch_size=patch_size)
        if vision_x is None:
            vision_x = np.zeros((1, 1, 1, 3, patch_size, patch_size),
                                np.float32)
            frame_mask = None
        if frame_mask is not None and bool(frame_mask.all()):
            frame_mask = None   # no padding -> skip the masked variant
        gen = _parse_gen_kwargs(params.get("generation_kwargs", {}))
        enc = tokenizer(prompt, return_tensors="np")
        lang_x = enc["input_ids"].astype(np.int32)
        sid = params.get("session_id")
        spec_ok = (gen.num_beams <= 1 and not gen.no_repeat_ngram_size
                   and not gen.bad_words_ids and frame_mask is None)
        if spec_sessions is not None and sid and spec_ok:
            sess = spec_sessions.get(sid)
            try:
                yield from relay(sess.stream(
                    jnp.asarray(vision_x), lang_x, gen=gen))
                return
            except ValueError:
                # conversation outgrew the session cache — stateless path
                spec_sessions.drop(sid)
        if sessions is not None and sid and gen.num_beams <= 1 \
                and frame_mask is None:
            sess = sessions.get(sid)
            try:
                yield from relay(sess.stream(
                    jnp.asarray(vision_x), lang_x, gen=gen))
                return
            except ValueError:
                sessions.drop(sid)
        if spec is not None and spec_ok:
            yield from relay(spec.stream(
                jnp.asarray(vision_x), lang_x, gen=gen))
            return
        if gen.num_beams > 1:
            # beams stream too: best-beam-so-far per chunk (cumulative
            # re-render, may revise earlier tokens)
            for toks in engine.stream_beam_generate(
                    jnp.asarray(vision_x), lang_x, gen=gen):
                yield tokenizer.decode(toks, skip_special_tokens=True)
            return
        vm = None if frame_mask is None else jnp.asarray(frame_mask)
        yield from relay(engine.stream_generate(
            jnp.asarray(vision_x), lang_x, gen=gen, vision_mask=vm))

    return stream_fn


def make_idefics_stream_fn(engine, tokenizer, cfg, *,
                           stream_interval: int = 2):
    """Streaming bridge for the IDEFICS family: stills are normalized with
    the IDEFICS mean/std and stacked along N ([B, N, C, H, W]); the prompt
    follows the idefics-instruct chat contract (serve/conversation.py
    `idefics_instruct`). Generation stops at <end_of_utterance>/eos."""
    import jax.numpy as jnp
    from otter_tpu.data.templates import (IDEFICS_STANDARD_MEAN,
                                          IDEFICS_STANDARD_STD)

    patch_size = cfg.vision.image_size

    def stream_fn(params: dict) -> Iterator[str]:
        prompt = params["prompt"]
        vision_x, _ = decode_media_to_vision_x(
            params.get("images"), patch_size=patch_size,
            mean=IDEFICS_STANDARD_MEAN, std=IDEFICS_STANDARD_STD)
        if vision_x is None:
            vision_x = np.zeros((1, 1, 1, 3, patch_size, patch_size),
                                np.float32)
        # [1, T, F, C, H, W] -> [1, N, C, H, W] (idefics has no frame axis)
        vision_x = vision_x.reshape((1, -1) + vision_x.shape[3:])
        gen = _parse_gen_kwargs(params.get("generation_kwargs", {}))
        enc = tokenizer(prompt, return_tensors="np")
        lang_x = enc["input_ids"].astype(np.int32)
        text, pending = "", []
        for i, tok in enumerate(engine.stream_generate(
                jnp.asarray(vision_x), lang_x, gen=gen)):
            pending.append(tok)
            if (i + 1) % stream_interval == 0:
                text += tokenizer.decode(pending, skip_special_tokens=True)
                pending = []
                yield text
        if pending:
            text += tokenizer.decode(pending, skip_special_tokens=True)
        yield text

    return stream_fn


def make_fuyu_stream_fn(model, params, processor, cfg, tokenizer, *,
                        stream_interval: int = 2, resolution=None,
                        cache_dtype=None):
    """Streaming bridge for Fuyu/OtterHD (the reference's Flask deploy
    endpoint, `pipeline/serve/deploy/otterhd_endpoint.py:62-98`, rebuilt on
    the worker protocol): variable-resolution patching through the
    bucketed FuyuProcessor, jitted prefill + donated-cache decode steps,
    box/point coordinate post-processing on the final text."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from otter_tpu.generation import sampling
    from otter_tpu.models.decoder import init_cache

    prefill_fns: dict = {}
    step_fns: dict = {}
    dtype = cache_dtype if cache_dtype is not None else model.dtype

    def get_prefill(s, p, cache_len):
        key = (s, p, cache_len)
        if key not in prefill_fns:
            def prefill(params, ids, patches, pidx, mask):
                cache = init_cache(cfg.text, 1, cache_len, dtype)
                positions = jnp.clip(jnp.cumsum(mask, -1) - 1, 0,
                                     None).astype(jnp.int32)
                logits, cache = model.apply(
                    params, ids, image_patches=patches,
                    image_patches_indices=pidx, attention_mask=mask,
                    positions=positions, cache=cache)
                return logits[:, -1], cache
            prefill_fns[key] = jax.jit(prefill)
        return prefill_fns[key]

    def get_step(cache_len):
        if cache_len not in step_fns:
            def step(params, tok, cache, cache_pos, kv_valid, positions):
                logits, cache = model.apply(
                    params, tok, cache=cache, cache_pos=cache_pos,
                    kv_valid=kv_valid, positions=positions)
                return logits[:, -1], cache
            step_fns[cache_len] = jax.jit(step, donate_argnums=(2,))
        return step_fns[cache_len]

    def stream_fn(http_params: dict) -> Iterator[str]:
        prompt = http_params["prompt"]
        gen = _parse_gen_kwargs(http_params.get("generation_kwargs", {}))
        imgs = http_params.get("images") or []
        image = None
        if imgs:
            b64 = imgs[0][0] if isinstance(imgs[0], list) else imgs[0]
            image = Image.open(io.BytesIO(
                base64.urlsafe_b64decode(b64))).convert("RGB")
        batch = processor([prompt], [image] if image is not None else None,
                          target_resolution=resolution, left_pad=True)
        ids = np.asarray(batch["input_ids"], np.int32)
        b, s = ids.shape
        # large caches round to 512 so the decode kernel keeps block_k=512
        # (padding past the valid length is skipped in-kernel, so it costs
        # no HBM reads — only allocation)
        gran = 512 if s + gen.max_new_tokens > 1024 else 128
        cache_len = -(-(s + gen.max_new_tokens) // gran) * gran
        logits, cache = get_prefill(
            s, batch["image_patches"].shape[1], cache_len)(
            params, jnp.asarray(ids),
            jnp.asarray(batch["image_patches"]),
            jnp.asarray(batch["image_patches_indices"]),
            jnp.asarray(batch["attention_mask"]))
        real_len = int(batch["attention_mask"].sum())
        kv_valid = np.concatenate(
            [batch["attention_mask"].astype(bool),
             np.zeros((b, cache_len - s), bool)], -1)
        kv_valid = jnp.asarray(kv_valid)
        eos = gen.eos_token_id if gen.eos_token_id is not None \
            else tokenizer.eos_token_id
        rng = jax.random.PRNGKey(0)
        step = get_step(cache_len)
        out_ids: list = []
        text = ""
        tok = None
        for t in range(gen.max_new_tokens):
            rng, sub = jax.random.split(rng)
            tok = int(sampling.sample_token(
                sub, logits, do_sample=gen.do_sample,
                temperature=gen.temperature, top_k=gen.top_k,
                top_p=gen.top_p)[0])
            if tok == eos:
                break
            out_ids.append(tok)
            if len(out_ids) % stream_interval == 0:
                text = tokenizer.decode(out_ids, skip_special_tokens=True)
                yield text
            if t == gen.max_new_tokens - 1:
                break
            kv_valid = kv_valid | (jnp.arange(cache_len)[None] == s + t)
            logits, cache = step(
                params, jnp.full((b, 1), tok, jnp.int32), cache, s + t,
                kv_valid, jnp.full((b, 1), real_len + t, jnp.int32))
        text = tokenizer.decode(out_ids, skip_special_tokens=True)
        # bbox/point token spans -> scaled coordinates
        yield processor.post_process_box_coordinates(text)

    return stream_fn


def build_app(worker: ModelWorker):
    from aiohttp import web

    async def worker_generate_stream(request):
        params = await request.json()
        resp = web.StreamResponse()
        await resp.prepare(request)
        loop = __import__("asyncio").get_event_loop()
        gen = worker.generate_stream_gate(params)

        def next_chunk():
            try:
                return next(gen)
            except StopIteration:
                return None

        while True:
            chunk = await loop.run_in_executor(None, next_chunk)
            if chunk is None:
                break
            await resp.write(chunk)
        return resp

    async def worker_get_status(request):
        return web.json_response(worker.get_status())

    app = web.Application()
    app.router.add_post("/worker_generate_stream", worker_generate_stream)
    app.router.add_post("/worker_get_status", worker_get_status)
    return app


def _run_idefics_worker(args):
    """Host an HF IdeficsForVisionText2Text checkpoint (the model family
    the reference trains via instruction_following.py:331-427 and serves
    through its demo endpoints)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aiohttp import web
    from flax import traverse_util
    from transformers import AutoTokenizer
    from otter_tpu.config import idefics9b
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.convert import (hf_to_flax, idefics_rules,
                                          load_state_dict)
    from otter_tpu.models.idefics import IdeficsVLM

    cfg = idefics9b()
    cfg = cfg.replace(text=cfg.text.replace(decode_kernel="auto"))
    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32,
             "int8": jnp.bfloat16, "int4": jnp.bfloat16}[args.load_bit]
    if args.load_bit in ("int8", "int4"):
        # idefics' silu_glu MLP has no fused int4 path; int4 degrades
        # gracefully to int8 everywhere (quantize_params_int4 packs
        # nothing to 4 bits on glu triples)
        cfg = cfg.replace(text=cfg.text.replace(quant=args.load_bit))
    model = IdeficsVLM(cfg, dtype=dtype)
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    sd = load_state_dict(args.checkpoint)
    flat = hf_to_flax(sd, cfg, rules=idefics_rules(cfg), dtype=np.float32)
    params = {"params": traverse_util.unflatten_dict(flat, sep="/")}
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else
        jnp.asarray(x), params)
    if args.load_bit in ("int8", "int4"):
        from otter_tpu.ops.quant import (quantize_params,
                                         quantize_params_int4)
        qfn = (quantize_params_int4 if args.load_bit == "int4"
               else quantize_params)
        params = {"params": qfn(params["params"])}
    cache_dtype = (args.cache_bit if args.cache_bit in ("int8", "int4")
                   else jnp.bfloat16)
    if args.continuous_batching:
        from otter_tpu.data.templates import (IDEFICS_STANDARD_MEAN,
                                              IDEFICS_STANDARD_STD)
        from otter_tpu.generation.batching import ContinuousBatcher
        batcher = ContinuousBatcher(model, params, cfg,
                                    num_slots=args.num_slots,
                                    cache_len=args.cache_len,
                                    cache_dtype=cache_dtype)
        stream_fn = make_batched_stream_fn(batcher, tokenizer, cfg,
                                           mean=IDEFICS_STANDARD_MEAN,
                                           std=IDEFICS_STANDARD_STD)
    else:
        engine = OtterGenerator(model, params, cfg,
                                cache_dtype=cache_dtype)
        stream_fn = make_idefics_stream_fn(engine, tokenizer, cfg)
    addr = args.worker_address or f"http://localhost:{args.port}"
    worker = ModelWorker(
        controller_addr=args.controller_address, worker_addr=addr,
        model_name=args.model_name, stream_fn=stream_fn,
        limit_model_concurrency=args.limit_model_concurrency,
        no_register=args.no_register)
    web.run_app(build_app(worker), host=args.host, port=args.port)


def _run_fuyu_worker(args):
    """Host a Fuyu/OtterHD checkpoint behind the worker protocol (the
    reference's standalone OtterHD Flask endpoint, deploy/otterhd_endpoint
    .py:62-98, gains controller registration/heartbeat and streaming)."""
    import jax.numpy as jnp
    from aiohttp import web
    from flax import traverse_util
    from transformers import AutoTokenizer
    from otter_tpu.config import FuyuConfig
    from otter_tpu.data.fuyu_processor import (FuyuImageProcessor,
                                               FuyuProcessor)
    from otter_tpu.models.convert import fuyu_hf_to_flax, load_state_dict
    from otter_tpu.models.fuyu import FuyuVLM

    cfg = FuyuConfig()
    # serving default like the other families: Pallas decode kernel for
    # long caches (OtterHD contexts reach 16k) and always for int8 caches
    cfg = cfg.replace(text=cfg.text.replace(decode_kernel="auto"))
    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32,
             "int8": jnp.bfloat16, "int4": jnp.bfloat16}[args.load_bit]
    if args.load_bit in ("int8", "int4"):
        # persimmon's biased ffn has no fused int4 path; int4 degrades
        # gracefully to int8 (quantize_params_int4 skips biased kernels)
        cfg = cfg.replace(text=cfg.text.replace(quant=args.load_bit))
    if getattr(args, "quant_embed", False):
        cfg = cfg.replace(text=cfg.text.replace(quant_embed=True))
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    processor = FuyuProcessor(
        tokenizer, FuyuImageProcessor(patch_size=cfg.patch_size),
        image_placeholder_id=cfg.image_placeholder_id,
        image_newline_id=cfg.image_newline_id)
    model = FuyuVLM(cfg, dtype=dtype)
    converted = fuyu_hf_to_flax(load_state_dict(args.checkpoint),
                                dtype=dtype)
    params = {"params": traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in converted.items()}, sep="/")}
    if args.load_bit in ("int8", "int4"):
        from otter_tpu.ops.quant import (quantize_params,
                                         quantize_params_int4)
        qfn = (quantize_params_int4 if args.load_bit == "int4"
               else quantize_params)
        params = {"params": qfn(params["params"])}
    if getattr(args, "quant_embed", False):
        from otter_tpu.ops.quant import quantize_embed
        params = {"params": quantize_embed(params["params"])}
    resolution = None
    if args.fuyu_resolution:
        h, w = args.fuyu_resolution.lower().split("x")
        resolution = (int(h), int(w))
    stream_fn = make_fuyu_stream_fn(
        model, params, processor, cfg, tokenizer, resolution=resolution,
        cache_dtype=(args.cache_bit
                     if args.cache_bit in ("int8", "int4") else None))
    addr = args.worker_address or f"http://localhost:{args.port}"
    worker = ModelWorker(
        controller_addr=args.controller_address, worker_addr=addr,
        model_name=args.model_name, stream_fn=stream_fn,
        limit_model_concurrency=args.limit_model_concurrency,
        no_register=args.no_register)
    web.run_app(build_app(worker), host=args.host, port=args.port)


def main():
    import argparse
    from aiohttp import web
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=21002)
    p.add_argument("--controller-address", default="http://localhost:21001")
    p.add_argument("--worker-address", default=None)
    p.add_argument("--model-name", default="otter")
    p.add_argument("--checkpoint", required=True,
                   help="HF-format Otter checkpoint dir/file")
    from otter_tpu.config import PRESETS
    p.add_argument("--config", default="mpt7b", choices=sorted(PRESETS))
    p.add_argument("--model-family", default="otter",
                   choices=["otter", "idefics", "fuyu"],
                   help="otter: Flamingo-style VLM presets; idefics: HF "
                        "IdeficsForVisionText2Text checkpoints; fuyu: "
                        "Fuyu/OtterHD (adept/fuyu-8b-style) checkpoints")
    p.add_argument("--fuyu-resolution", default=None,
                   help="fixed HxW (e.g. 448x448) instead of bucketed "
                        "variable resolution (OtterHD serves high-res)")
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--limit-model-concurrency", type=int, default=5)
    p.add_argument("--load-bit", default="bf16",
                   choices=["bf16", "fp32", "int8", "int4"],
                   help="int8: weight-only int8 decoder kernels; int4: "
                        "additionally nibble-packs un-biased two-matmul "
                        "MLP pairs (0.5 B/weight — mpt/mosaic/falcon; "
                        "silu_glu and biased archs degrade to int8). "
                        "The reference's fp16 option is deliberately "
                        "absent: bf16 is the TPU-native half precision "
                        "(same byte width, MXU-preferred, no loss-scale "
                        "hazards) — pass bf16 where the reference used "
                        "fp16 (model_worker.py:91-100)")
    p.add_argument("--no-register", action="store_true")
    p.add_argument("--continuous-batching", action="store_true",
                   help="multiplex concurrent requests through one shared "
                        "decode step (slot pool) instead of serializing")
    p.add_argument("--num-slots", type=int, default=4)
    p.add_argument("--prefill-chunk", type=int, default=256, metavar="C",
                   help="continuous batching (otter family): split long "
                        "prompt prefills into C-token cache-append steps "
                        "interleaved with decode iterations, bounding "
                        "every active stream's admission stall at one "
                        "chunk instead of the whole prompt; 0 = one-shot "
                        "prefill. Default 256: measured on-chip best "
                        "(active-stream p99 gap 61.6 ms vs 74.8 one-shot "
                        "and 67.1 at C=128, equal steady-state — "
                        "BENCH_NOTES chunked-prefill A/B)")
    p.add_argument("--cache-len", type=int, default=2048)
    p.add_argument("--cache-bit", default="bf16", choices=["bf16", "int8", "int4"],
                   help="int8 quantizes the KV cache (per-position max-abs"
                        " scales, in-kernel dequant): half the cache HBM"
                        " read per decode step at long contexts; int4"
                        " nibble-packs head-dim pairs (quarter the read)")
    p.add_argument("--quant-embed", action="store_true",
                   help="store the embedding TABLE as int8 rows "
                        "(untied-embedding families, e.g. fuyu/otterhd:"
                        " the 262k-vocab bf16 wte is 2.15 GB of pure"
                        " residency). Chip-measured: keeps OtterHD-8B"
                        " full-HD decode out of the single-chip HBM"
                        " thrash zone — 79.0 tok/s vs 1.9 without"
                        " (BENCH_NOTES round-5 OtterHD table)")
    p.add_argument("--session-cache", type=int, default=0, metavar="N",
                   help="keep up to N per-conversation KV caches between "
                        "turns (requests carrying a session_id only "
                        "prefill the new part of the conversation; "
                        "beyond-reference TTFT win, see docs/serving.md). "
                        "Each session pins a cache-len KV cache in HBM. "
                        "0 disables. Incompatible with "
                        "--continuous-batching (slots already share one "
                        "cache)")
    p.add_argument("--draft-checkpoint", default=None,
                   help="checkpoint of a small same-vocabulary draft "
                        "model: greedy/sampled single-stream requests "
                        "decode speculatively (gamma draft tokens per "
                        "target verify window; greedy output is exact, "
                        "sampled is distributionally exact; "
                        "docs/serving.md). With --session-cache the two "
                        "compose per session_id. Flagship pairing: "
                        "mpt7b target + mpt1b draft")
    p.add_argument("--draft-config", default="mpt1b",
                   choices=sorted(PRESETS))
    p.add_argument("--draft-gamma", type=int, default=4,
                   help="MAX draft tokens per verify round; with "
                        "--spec-adaptive (default) the controller picks "
                        "per-round among {gamma, gamma//2, plain} from "
                        "measured acceptance + round times")
    p.add_argument("--spec-adaptive", dest="spec_adaptive",
                   action="store_true", default=True,
                   help="acceptance-adaptive speculation (default ON): "
                        "EMA of committed tokens/round vs measured "
                        "round times auto-drops gamma — down to plain "
                        "decode — below break-even, so low-acceptance "
                        "traffic (e.g. sampled T=1) never decodes "
                        "slower than a draft-free pool (docs/serving.md)")
    p.add_argument("--no-spec-adaptive", dest="spec_adaptive",
                   action="store_false",
                   help="pin speculation at --draft-gamma unconditionally")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from otter_tpu import config as cfgmod
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.convert import load_otter_checkpoint
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    if args.model_family == "idefics":
        _run_idefics_worker(args)
        return
    if args.model_family == "fuyu":
        _run_fuyu_worker(args)
        return
    cfg = cfgmod.PRESETS[args.config]()
    # serving default: route long caches through the Pallas decode kernel
    cfg = cfg.replace(text=cfg.text.replace(decode_kernel="auto"))
    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32,
             "int8": jnp.bfloat16, "int4": jnp.bfloat16}[args.load_bit]
    quantize = args.load_bit in ("int8", "int4")
    if quantize:
        cfg = cfg.replace(text=cfg.text.replace(quant=args.load_bit))
    model = OtterVLM(cfg, dtype=dtype)
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)

    # load into a bf16 non-quant tree first, then quantize the decoder
    # kernels (Otter-MPT7B: 16.6GB bf16 -> 9.8GB int8, fits one v5e)
    load_cfg = cfg.replace(text=cfg.text.replace(quant=None)) \
        if quantize else cfg
    load_model = OtterVLM(load_cfg, dtype=dtype)
    shapes = jax.eval_shape(
        load_model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 1, 3, cfg.vision.image_size,
                   cfg.vision.image_size), dtype),
        jnp.zeros((1, 8), jnp.int32))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), shapes)
    params = load_otter_checkpoint(args.checkpoint, load_cfg, params,
                                   dtype=dtype)
    if quantize:
        from otter_tpu.ops.quant import (quantize_params,
                                         quantize_params_int4)
        qfn = (quantize_params_int4 if args.load_bit == "int4"
               else quantize_params)
        params = {"params": qfn(params["params"])}
    cache_dtype = (args.cache_bit if args.cache_bit in ("int8", "int4")
                   else jnp.bfloat16)
    draft = None
    if args.draft_checkpoint:
        cfg_d = cfgmod.PRESETS[args.draft_config]()
        cfg_d = cfg_d.replace(
            text=cfg_d.text.replace(decode_kernel="auto"))
        if quantize:
            cfg_d = cfg_d.replace(
                text=cfg_d.text.replace(quant=args.load_bit))
        model_d = OtterVLM(cfg_d, dtype=dtype)
        load_cfg_d = cfg_d.replace(
            text=cfg_d.text.replace(quant=None)) if quantize else cfg_d
        load_model_d = OtterVLM(load_cfg_d, dtype=dtype)
        shapes_d = jax.eval_shape(
            load_model_d.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 1, 1, 3, cfg_d.vision.image_size,
                       cfg_d.vision.image_size), dtype),
            jnp.zeros((1, 8), jnp.int32))
        params_d = jax.tree_util.tree_map(
            lambda s: jnp.zeros(
                s.shape, dtype if jnp.issubdtype(s.dtype, jnp.floating)
                else s.dtype), shapes_d)
        params_d = load_otter_checkpoint(
            args.draft_checkpoint, load_cfg_d, params_d, dtype=dtype)
        if quantize:
            params_d = {"params": qfn(params_d["params"])}
        draft = (model_d, params_d, cfg_d)
    if args.continuous_batching:
        if args.session_cache > 0:
            # the slot pool shares one cache; cross-turn prefix reuse is
            # not available there — fail loudly instead of silently
            # dropping the flag (docs/serving.md "composing the modes")
            p.error("--session-cache is incompatible with "
                    "--continuous-batching: slots share one pooled KV "
                    "cache, so cross-turn prefix reuse is unavailable. "
                    "Drop one of the two flags.")
        from otter_tpu.generation.batching import ContinuousBatcher
        # with a draft attached every decode iteration becomes a
        # batched speculative round over the whole slot pool
        batcher = ContinuousBatcher(model, params, cfg,
                                    num_slots=args.num_slots,
                                    cache_len=args.cache_len,
                                    cache_dtype=cache_dtype,
                                    prefill_chunk=args.prefill_chunk,
                                    draft=draft,
                                    spec_gamma=args.draft_gamma,
                                    spec_adaptive=args.spec_adaptive)
        stream_fn = make_batched_stream_fn(batcher, tokenizer, cfg)
    else:
        engine = OtterGenerator(model, params, cfg,
                                cache_dtype=cache_dtype)
        sessions = None
        if args.session_cache > 0:
            from otter_tpu.generation.session import SessionPool
            sessions = SessionPool(model, params, cfg,
                                   max_sessions=args.session_cache,
                                   cache_len=args.cache_len,
                                   cache_dtype=cache_dtype)
        spec = None
        if draft is not None:
            from otter_tpu.generation.speculative import \
                SpeculativeGenerator
            model_d, params_d, cfg_d = draft
            spec = SpeculativeGenerator(
                model, params, cfg, model_d, params_d, cfg_d,
                gamma=args.draft_gamma, cache_dtype=cache_dtype)
        spec_sessions = None
        if spec is not None and args.session_cache > 0:
            # compose: session_id requests get cross-turn prefix reuse
            # AND speculative rounds; the plain pool still serves sid
            # requests spec can't take (ngram/bad-words bans), so no
            # second cache is pinned unless such a request arrives
            from otter_tpu.generation.session import (SessionPool,
                                                      SpecChatSession)
            spec_sessions = SessionPool(
                model, params, cfg, max_sessions=args.session_cache,
                factory=lambda: SpecChatSession(
                    spec, cache_len=args.cache_len))
        stream_fn = make_otter_stream_fn(engine, tokenizer, cfg,
                                         sessions=sessions, spec=spec,
                                         spec_sessions=spec_sessions)

    addr = args.worker_address or f"http://localhost:{args.port}"
    worker = ModelWorker(
        controller_addr=args.controller_address, worker_addr=addr,
        model_name=args.model_name, stream_fn=stream_fn,
        limit_model_concurrency=args.limit_model_concurrency,
        no_register=args.no_register)
    web.run_app(build_app(worker), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
