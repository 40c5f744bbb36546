"""Third-party benchmark adapters (llava / instructblip / qwen_vl)
driven end-to-end through TINY in-process HF models — the reference
can only run these against downloaded multi-GB checkpoints on CUDA
(`pipeline/benchmarks/models/{llava_model,instructblip,qwen_vl}.py`);
here generate() and the eval_forward log-likelihood hook run on host
CPU with randomly initialized configs."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

from PIL import Image  # noqa: E402


def _pil(rng, hw=40):
    return Image.fromarray(
        rng.integers(0, 255, (hw, hw, 3)).astype(np.uint8))


def _word_tokenizer(cls, words, special, **kw):
    from tokenizers import Tokenizer, models, pre_tokenizers
    vocab = {w: i for i, w in enumerate(words + special)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    t = cls(tokenizer_object=tok, unk_token="<unk>", **kw)
    if special:
        t.add_special_tokens({"additional_special_tokens": special})
    t.model_input_names = ["input_ids", "attention_mask"]
    return t


def _check(adapter, rng):
    """Common contract: generate returns a str; eval_forward is a finite
    log-likelihood that decreases for a longer (more tokens) answer."""
    img = _pil(rng)
    out = adapter.generate("what is this", img)
    assert isinstance(out, str)
    ll = adapter.eval_forward("what is this", "a cat", img)
    ll_long = adapter.eval_forward("what is this",
                                   "cat cat cat cat cat", img)
    assert np.isfinite(ll) and np.isfinite(ll_long)
    assert ll_long < ll  # more tokens -> lower total log-prob


def test_llava_adapter_tiny(rng):
    from transformers import (CLIPImageProcessor, CLIPVisionConfig,
                              LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration,
                              LlavaProcessor, PreTrainedTokenizerFast)
    from otter_tpu.benchmarks.models.llava import LLaVA

    tok = _word_tokenizer(
        PreTrainedTokenizerFast,
        ["<unk>", "</s>", "USER", "ASSISTANT", "what", "is", "this",
         "a", "cat"], ["<image>"], eos_token="</s>", pad_token="</s>")
    img_id = tok.convert_tokens_to_ids("<image>")
    vis = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=14)
    txt = LlamaConfig(vocab_size=len(tok) + 4, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128)
    cfg = LlavaConfig(vision_config=vis, text_config=txt,
                      image_token_index=img_id,
                      vision_feature_select_strategy="default",
                      vision_feature_layer=-1, image_seq_length=4)
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg).eval()
    proc = LlavaProcessor(
        image_processor=CLIPImageProcessor(
            size={"shortest_edge": 28},
            crop_size={"height": 28, "width": 28}),
        tokenizer=tok, patch_size=14,
        vision_feature_select_strategy="default",
        num_additional_image_tokens=1)
    ad = LLaVA(model=model, processor=proc, do_sample=False,
               max_new_tokens=4)
    _check(ad, rng)


def test_instructblip_adapter_tiny(rng):
    from transformers import (BlipImageProcessor, InstructBlipConfig,
                              InstructBlipForConditionalGeneration,
                              InstructBlipProcessor,
                              InstructBlipQFormerConfig,
                              InstructBlipVisionConfig, LlamaConfig,
                              PreTrainedTokenizerFast)
    from otter_tpu.benchmarks.models.instructblip import InstructBLIP

    words = ["<unk>", "</s>", "what", "is", "this", "Answer", "a", "cat"]
    tok = _word_tokenizer(PreTrainedTokenizerFast, words, [],
                          eos_token="</s>", pad_token="</s>",
                          bos_token="</s>")
    qtok = _word_tokenizer(PreTrainedTokenizerFast, words, [],
                           eos_token="</s>", pad_token="</s>",
                           bos_token="</s>")
    vis = InstructBlipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14)
    qf = InstructBlipQFormerConfig(
        vocab_size=len(qtok) + 2, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        encoder_hidden_size=32)
    txt = LlamaConfig(vocab_size=len(tok) + 4, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128)
    proc = InstructBlipProcessor(
        image_processor=BlipImageProcessor(
            size={"height": 28, "width": 28}),
        tokenizer=tok, qformer_tokenizer=qtok, num_query_tokens=4)
    img_id = tok.convert_tokens_to_ids(proc.image_token.content)
    cfg = InstructBlipConfig(
        vision_config=vis.to_dict(), qformer_config=qf.to_dict(),
        text_config=txt.to_dict(), num_query_tokens=4,
        image_token_index=img_id)
    torch.manual_seed(0)
    model = InstructBlipForConditionalGeneration(cfg).eval()
    ad = InstructBLIP(model=model, processor=proc, max_new_tokens=4)
    _check(ad, rng)


def test_qwen_vl_adapter_tiny(rng):
    from transformers import (Qwen2TokenizerFast, Qwen2VLConfig,
                              Qwen2VLForConditionalGeneration,
                              Qwen2VLImageProcessor)
    from otter_tpu.benchmarks.models.qwen_vl import (
        QwenImageTextProcessor, QwenVL)

    spec = ["<|im_start|>", "<|im_end|>", "<|vision_start|>",
            "<|vision_end|>", "<|image_pad|>", "<|video_pad|>",
            "<|endoftext|>"]
    tok = _word_tokenizer(
        Qwen2TokenizerFast,
        ["<unk>", "what", "is", "this", "a", "cat"], spec,
        eos_token="<|im_end|>", pad_token="<|endoftext|>")
    ids = {s: tok.convert_tokens_to_ids(s) for s in spec}
    vis = dict(depth=2, embed_dim=32, hidden_size=32, num_heads=4,
               in_chans=3, patch_size=14, spatial_merge_size=2,
               temporal_patch_size=2, mlp_ratio=2)
    cfg = Qwen2VLConfig(
        vocab_size=len(tok) + 2, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, vision_config=vis,
        image_token_id=ids["<|image_pad|>"],
        video_token_id=ids["<|video_pad|>"],
        vision_start_token_id=ids["<|vision_start|>"],
        vision_end_token_id=ids["<|vision_end|>"],
        rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]})
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(cfg).eval()
    proc = QwenImageTextProcessor(
        Qwen2VLImageProcessor(min_pixels=28 * 28, max_pixels=56 * 56,
                              patch_size=14, temporal_patch_size=2,
                              merge_size=2), tok)
    ad = QwenVL(model=model, processor=proc, max_new_tokens=4)
    _check(ad, rng)


def test_registry_covers_reference_names():
    """Every reference model-registry name is either implemented or an
    explicit de-scope with a reason (reference base_model.py:7-23)."""
    from otter_tpu.benchmarks.models.base_model import (AVAILABLE_MODELS,
                                                        DESCOPED_MODELS,
                                                        load_model)
    reference_names = {
        "otter_image", "otter_video", "otterhd", "fuyu", "idefics",
        "llava", "qwen_vl", "instructblip", "gpt4v", "video_chat",
        "video_chatgpt", "mplug_owl", "llama_adapter", "frozen_bilm"}
    covered = set(AVAILABLE_MODELS) | set(DESCOPED_MODELS)
    assert reference_names <= covered, reference_names - covered
    with pytest.raises(NotImplementedError, match="de-scoped"):
        load_model("video_chat")
