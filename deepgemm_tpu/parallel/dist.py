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


class CollectiveWatchdog:
    """Failure-detection watchdog for collective/RDMA sections — the TPU
    analog of the reference's 60-second NVSHMEM barrier watchdogs
    (/root/reference/deep_gemm/include/deep_gemm/comm/barrier.cuh — spin
    loops that abort with a diagnostic instead of hanging forever).

    XLA's collective runtime detects most peer failures itself, but a Pallas
    RDMA kernel waiting on a semaphore that a crashed peer never signals
    hangs silently. Wrap the host-side sync point::

        with CollectiveWatchdog(60, label='mega dispatch'):
            jax.block_until_ready(out)

    On expiry the watchdog prints a rank-stamped diagnostic (and optionally
    invokes ``on_timeout``) WITHOUT killing the process — the hung transfer
    may still complete, and serving stacks want the log line, not a crash.
    Pass ``fatal=True`` to raise ``TimeoutError`` from the main thread on
    exit instead.
    """

    def __init__(self, timeout_s: float = 60.0, label: str = '',
                 on_timeout=None, fatal: bool = False):
        self.timeout_s = timeout_s
        self.label = label
        self.on_timeout = on_timeout
        self.fatal = fatal
        self.fired = False
        self._timer = None

    def _fire(self):
        self.fired = True
        dist_print(f'WATCHDOG: collective section {self.label!r} exceeded '
                   f'{self.timeout_s:.0f}s — a peer may have failed '
                   f'(devices: {jax.device_count()})', rank=None)
        if self.on_timeout is not None:
            self.on_timeout()

    def __enter__(self):
        import threading
        self._timer = threading.Timer(self.timeout_s, self._fire)
        self._timer.daemon = True
        self._timer.start()
        return self

    def __exit__(self, exc_type, exc, tb):
        self._timer.cancel()
        if self.fired and self.fatal and exc_type is None:
            raise TimeoutError(
                f'collective section {self.label!r} exceeded '
                f'{self.timeout_s:.0f}s')
        return False


def blocking_collective(out, timeout_s: float = 60.0, label: str = '',
                        fatal: bool = False):
    """``jax.block_until_ready`` under a :class:`CollectiveWatchdog`."""
    with CollectiveWatchdog(timeout_s, label=label, fatal=fatal) as wd:
        jax.block_until_ready(out)
    return wd.fired
