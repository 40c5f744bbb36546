"""Device mesh and sharding utilities.

Replaces the reference's NCCL/Accelerate/DeepSpeed distributed layer
(`pipeline/train/distributed.py:25-96`, `pipeline/accelerate_configs/`) with a
single JAX mesh: axes ("data", "fsdp", "seq", "tensor").

  - DDP            -> dp > 1
  - ZeRO-1/2/3     -> fsdp > 1 (params/grads/opt-state sharded over "fsdp")
  - device_map     -> tp > 1 (tensor-parallel sharding of attention/MLP)
  - (no reference equivalent) -> sp > 1: sequence/context parallelism —
    activations sharded along the sequence dim, self-attention rotates KV
    around the "seq" ring (ops/ring_attention.py). Long-context training
    headroom the reference's NCCL stack does not have.

Collectives ride ICI via XLA; nothing here issues explicit NCCL-style calls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from otter_tpu.config import ParallelConfig

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
SEQ_AXIS = "seq"
TENSOR_AXIS = "tensor"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, SEQ_AXIS, TENSOR_AXIS)


def create_mesh(cfg: Optional[ParallelConfig] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the ("data", "fsdp", "seq", "tensor") mesh.

    `fsdp == -1` absorbs all devices not claimed by dp/sp/tp (the common
    case: 1 × N × 1 × 1 is ZeRO-3-style fully sharded data parallel).
    "seq" sits between "fsdp" and "tensor" so ring neighbors are
    ICI-adjacent within each fsdp group.
    """
    cfg = cfg or ParallelConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp, fsdp, sp, tp = cfg.dp, cfg.fsdp, getattr(cfg, "sp", 1), cfg.tp
    if fsdp == -1:
        if n % (dp * sp * tp) != 0:
            raise ValueError(
                f"device count {n} not divisible by dp*sp*tp={dp * sp * tp}")
        fsdp = n // (dp * sp * tp)
    if dp * fsdp * sp * tp != n:
        raise ValueError(
            f"dp*fsdp*sp*tp={dp * fsdp * sp * tp} != {n} devices")
    arr = np.array(devices).reshape(dp, fsdp, sp, tp)
    return Mesh(arr, MESH_AXES)


def batch_spec() -> P:
    """Batch dims shard over data+fsdp jointly (pure-DP view of activations)."""
    return P((DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host pytree onto the mesh, sharded along the leading batch dim."""
    sh = batch_sharding(mesh)

    n = mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]

    def put(x):
        if x.ndim >= 1 and x.shape[0] % n == 0:
            spec = P((DATA_AXIS, FSDP_AXIS), *([None] * (x.ndim - 1)))
        else:  # batch not divisible by the dp×fsdp extent: replicate
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def maybe_shard(x, *spec):
    """Activation sharding constraint, applied only when tracing under an
    active mesh (no-op otherwise). Guides GSPMD to keep batch-sharded
    activation layouts instead of involuntary resharding."""
    try:
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except Exception:
        return x


def local_mesh_for_testing(n: int = 8) -> Mesh:
    """CPU-simulated mesh; tests set XLA_FLAGS=--xla_force_host_platform_device_count."""
    devs = jax.devices()
    if len(devs) < n:
        raise RuntimeError(
            f"need {n} devices, have {len(devs)}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count before importing jax")
    return Mesh(np.array(devs[:n]).reshape(1, n, 1, 1), MESH_AXES)
