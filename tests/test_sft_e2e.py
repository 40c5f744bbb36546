"""End-to-end SFT smoke test: YAML -> datasets -> sharded train steps on the
8-device CPU mesh, checkpoint written and restorable."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from helpers import TinyTokenizer, write_mimicit_fixture


def test_sft_end_to_end(tmp_path, rng):
    from otter_tpu.train.args import TrainArgs
    from otter_tpu.train.sft import main

    ypath = write_mimicit_fixture(tmp_path, rng, n=16)
    args = TrainArgs(
        model_config="tiny", training_data_yaml=ypath,
        batch_size=8, num_epochs=1, learning_rate=1e-3,
        warmup_steps=0, logging_steps=1, workers=2,
        patch_image_size=28, max_seq_len=64,
        external_save_dir=str(tmp_path / "runs"), run_name="t",
        dp=1, fsdp=-1, tp=1, precision="fp32",
        save_ckpt_each_epoch=True, mask_lm_head=True)
    state = main(args, tokenizer=TinyTokenizer())
    assert int(state.step) >= 2
    ckpt_dir = tmp_path / "runs" / "t"
    assert any(d.startswith("checkpoint_") for d in os.listdir(ckpt_dir))
    assert (ckpt_dir / "metrics.jsonl").exists()
