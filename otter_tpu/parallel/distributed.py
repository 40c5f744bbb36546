"""Multi-host bootstrap.

Replaces `pipeline/train/distributed.py:25-96` (env/SLURM/MPI world
discovery + NCCL init_process_group) with `jax.distributed.initialize` over
the TPU fabric. The same env conventions are honored so existing launchers
(torchrun-style env, SLURM) keep working.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple


def world_info_from_env() -> Tuple[int, int, int]:
    """(local_rank, global_rank, world_size) from the env var conventions
    the reference scans (distributed.py:25-46): LOCAL_RANK/RANK/WORLD_SIZE,
    SLURM_*, OMPI_*."""
    local_rank = 0
    for v in ("LOCAL_RANK", "MPI_LOCALRANKID", "SLURM_LOCALID",
              "OMPI_COMM_WORLD_LOCAL_RANK"):
        if v in os.environ:
            local_rank = int(os.environ[v])
            break
    global_rank = 0
    for v in ("RANK", "PMI_RANK", "SLURM_PROCID", "OMPI_COMM_WORLD_RANK"):
        if v in os.environ:
            global_rank = int(os.environ[v])
            break
    world_size = 1
    for v in ("WORLD_SIZE", "PMI_SIZE", "SLURM_NTASKS",
              "OMPI_COMM_WORLD_SIZE"):
        if v in os.environ:
            world_size = int(os.environ[v])
            break
    return local_rank, global_rank, world_size


def init_distributed_device(*, coordinator_address: Optional[str] = None,
                            num_processes: Optional[int] = None,
                            process_id: Optional[int] = None) -> Tuple[int,
                                                                       int]:
    """Initialize multi-host JAX. On TPU pods jax.distributed autodetects;
    explicit coordinator args support SLURM/GCE-style launches
    (the init_distributed_device role, distributed.py:49-96).

    Returns (process_index, process_count)."""
    import jax
    _, rank, world = world_info_from_env()
    if world > 1 or coordinator_address or os.environ.get(
            "JAX_COORDINATOR_ADDRESS"):
        kwargs = {}
        if coordinator_address or os.environ.get("MASTER_ADDR"):
            addr = coordinator_address or (
                os.environ["MASTER_ADDR"] + ":" +
                os.environ.get("MASTER_PORT", "1234"))
            kwargs["coordinator_address"] = addr
            kwargs["num_processes"] = num_processes or world
            kwargs["process_id"] = process_id if process_id is not None \
                else rank
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()
