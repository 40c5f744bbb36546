"""Tokenizer adaptation on a real HF fast tokenizer built offline:
the Otter special-token policy and the MOD denoising sentinels
(reference `adapt_tokenizer.py:8-44`)."""

import pytest

transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")


def _fresh_tokenizer(with_pad=False, with_eos=True):
    from tokenizers import Tokenizer, models, pre_tokenizers
    vocab = {w: i for i, w in enumerate(
        ["<unk>", "hello", "world", "a", "b", "c"])}
    if with_eos:
        vocab["</s>"] = len(vocab)
    if with_pad:
        vocab["<pad>"] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    kw = {"unk_token": "<unk>"}
    if with_eos:
        kw["eos_token"] = "</s>"
    if with_pad:
        kw["pad_token"] = "<pad>"
    return transformers.PreTrainedTokenizerFast(tokenizer_object=tok, **kw)


def test_adapt_for_otter_adds_specials_and_reports_resize():
    from otter_tpu.data.tokenizer_adapt import adapt_for_otter
    tok = _fresh_tokenizer()
    before = len(tok)
    res = adapt_for_otter(tok)
    assert res.added == 3
    assert res.new_vocab == before + 3
    assert tok.convert_tokens_to_ids("<image>") == res.media_token_id
    assert tok.convert_tokens_to_ids("<|endofchunk|>") == res.eoc_token_id
    assert tok.convert_tokens_to_ids("<answer>") == res.answer_token_id
    # pad falls back to eos (instruction_following.py:348-350 policy)
    assert res.pad_token_id == tok.eos_token_id
    # specials never split
    ids = tok("<image> hello <answer> world <|endofchunk|>",
              add_special_tokens=False).input_ids
    assert res.media_token_id in ids and res.answer_token_id in ids \
        and res.eoc_token_id in ids
    # idempotent
    again = adapt_for_otter(tok)
    assert again.added == 0 and again.new_vocab == res.new_vocab
    assert again.media_token_id == res.media_token_id


def test_adapt_for_otter_apply_to_config():
    from otter_tpu.config import OtterConfig
    from otter_tpu.data.tokenizer_adapt import adapt_for_otter
    tok = _fresh_tokenizer()
    res = adapt_for_otter(tok)
    cfg = OtterConfig.tiny("mpt")
    base = cfg.replace(text=cfg.text.replace(
        vocab_size=len(tok) - res.added, extra_vocab=0))
    newc = res.apply_to(base)
    assert newc.media_token_id == res.media_token_id
    assert newc.eoc_token_id == res.eoc_token_id
    assert newc.answer_token_id == res.answer_token_id
    assert newc.text.extra_vocab == res.added
    assert newc.text.total_vocab == len(tok)


def test_adapt_no_answer_token():
    from otter_tpu.data.tokenizer_adapt import adapt_for_otter
    tok = _fresh_tokenizer()
    res = adapt_for_otter(tok, add_answer_token=False)
    assert res.added == 2 and res.answer_token_id == -1


def test_adapt_for_denoising_sentinels_and_pad():
    from otter_tpu.data.tokenizer_adapt import (SENTINEL_COUNT,
                                                adapt_for_denoising)
    tok = _fresh_tokenizer(with_eos=False)
    ids = adapt_for_denoising(tok)
    assert len(ids) == SENTINEL_COUNT
    assert len(set(ids)) == SENTINEL_COUNT
    assert tok.pad_token == "<pad>" and tok.pad_token_id is not None
    assert tok.sentinel_token_ids == ids
    assert tok.convert_tokens_to_ids("<extra_id_0>") == ids[0]
    # existing pad is left alone
    tok2 = _fresh_tokenizer(with_pad=True)
    adapt_for_denoising(tok2)
    assert tok2.pad_token == "<pad>"
