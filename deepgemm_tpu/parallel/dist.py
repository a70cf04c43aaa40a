"""Distributed helpers — the TPU analog of
/root/reference/deep_gemm/utils/dist.py:10-74.

The reference's control plane is NCCL via torch.distributed; on TPU it is
``jax.distributed`` + a ``jax.sharding.Mesh`` whose collectives ride ICI.
"""

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_dist(coordinator_address: Optional[str] = None,
              num_processes: Optional[int] = None,
              process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize multi-host JAX (analog of ``init_dist``,
    /root/reference/deep_gemm/utils/dist.py:10-35). No-op for single-process
    runs (the common single-host-with-N-chips case). Returns (rank, world)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def make_mesh(axes: Sequence[Tuple[str, int]],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a named mesh, e.g. ``make_mesh([('dp', 2), ('ep', 4)])``."""
    devices = list(devices if devices is not None else jax.devices())
    shape = [n for _, n in axes]
    total = int(np.prod(shape))
    assert total <= len(devices), (shape, len(devices))
    arr = np.asarray(devices[:total]).reshape(shape)
    return Mesh(arr, [name for name, _ in axes])


def uneven_all_gather(x: jnp.ndarray, axis_name: str, sizes) -> jnp.ndarray:
    """Pad-gather-trim all-gather of unevenly sized shards
    (/root/reference/deep_gemm/utils/dist.py:38-58). Inside shard_map only."""
    max_size = max(sizes)
    pad = max_size - x.shape[0]
    x_p = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    gathered = jax.lax.all_gather(x_p, axis_name)       # [world, max, ...]
    parts = [gathered[i, :sizes[i]] for i in range(len(sizes))]
    return jnp.concatenate(parts, axis=0)


def dist_print(*args, rank: Optional[int] = None, **kwargs):
    """Rank-filtered print (/root/reference/deep_gemm/utils/dist.py:61-74)."""
    if rank is None or jax.process_index() == rank:
        print(f'[rank {jax.process_index()}]', *args, **kwargs)
