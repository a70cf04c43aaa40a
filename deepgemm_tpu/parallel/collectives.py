"""Pallas RDMA collectives over ICI.

The reference's mega kernel moves tokens with one-sided NVLink
pulls/pushes through symmetric buffers, synchronized by in-kernel barriers
(/root/reference/deep_gemm/include/deep_gemm/impls/sm100_fp8_fp4_mega_moe.cuh:538-559,
comm/barrier.cuh:46-89, layout/sym_buffer.cuh:34-40). The TPU-native
equivalent implemented here: `pltpu.make_async_remote_copy` between
same-index buffers on peer devices with per-peer DMA semaphores — each rank
pushes its per-destination chunk directly into the destination's receive
slot, all transfers in flight concurrently over ICI.

`pallas_all_to_all` is a drop-in for `jax.lax.all_to_all(x, axis, 0, 0)`
(split/concat on axis 0) inside `shard_map`. On CPU meshes it runs under the
distributed interpreter (threads + simulated DMA), so the full semaphore
protocol is exercised by the test suite without hardware.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.common import ici_entry_barrier
from ..runtime.config import interpret_params, is_cpu_backend


def _a2a_kernel(x_ref, o_ref, send_sems, recv_sems, *, num_devices: int,
                axis_name: str):
    """x_ref [D, rows, h]: chunk d goes to device d; o_ref [D, rows, h]:
    slot s holds the chunk received from device s."""
    my = jax.lax.axis_index(axis_name)

    # Entry barrier before any one-sided push (the nvlink_barrier analog;
    # also what licenses collective_id with Mosaic).
    ici_entry_barrier(axis_name, num_devices)

    # Local chunk: plain VMEM copy (the reference's local-rank fast path).
    o_ref[pl.ds(my, 1)] = x_ref[pl.ds(my, 1)]

    # One-sided pushes to every peer, all started before any wait so the
    # ICI links run concurrently (the analog of the dispatch warps keeping
    # kNumBytesPerPull chunks in flight).
    for step in range(1, num_devices):
        dst = jax.lax.rem(my + step, num_devices)
        rdma = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(dst, 1)],
            dst_ref=o_ref.at[pl.ds(my, 1)],      # receiver slot = sender id
            send_sem=send_sems.at[step],
            recv_sem=recv_sems.at[step],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma.start()

    # Drain: wait for every send to clear our buffers and every receive to
    # land. step s's incoming chunk is from src = my - s (the sender whose
    # (src + s) mod D == my), and it targeted recv_sems[s].
    for step in range(1, num_devices):
        src = jax.lax.rem(my - step + num_devices, num_devices)
        waiter = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(jax.lax.rem(my + step, num_devices), 1)],
            dst_ref=o_ref.at[pl.ds(src, 1)],
            send_sem=send_sems.at[step],
            recv_sem=recv_sems.at[step],
            device_id=jax.lax.rem(my + step, num_devices),
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        waiter.wait()


def _a2a_call(x, *, axis_name: str, num_devices: int, collective_id: int):
    kernel = functools.partial(_a2a_kernel, num_devices=num_devices,
                               axis_name=axis_name)
    interpret = (interpret_params() if is_cpu_backend() else False)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((num_devices,)),
                        pltpu.SemaphoreType.DMA((num_devices,))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # collective_id names the entry-barrier semaphore; Mosaic
            # rejects it when no barrier is used (the D=1 no-peer case)
            collective_id=collective_id if num_devices > 1 else None),
        interpret=interpret,
    )(x)


def pallas_all_to_all(x: jnp.ndarray, axis_name: str,
                      collective_id: int = 0) -> jnp.ndarray:
    """All-to-all of ``x [D, ...]`` over mesh axis ``axis_name`` (split and
    concat on axis 0), implemented with one-sided remote DMA — semantics of
    ``jax.lax.all_to_all(x, axis_name, 0, 0, tiled=False)``. Must run inside
    ``shard_map``; ``x.shape[0]`` must equal the axis size."""
    num_devices = jax.lax.psum(1, axis_name)
    assert x.shape[0] == num_devices, (x.shape, num_devices)
    # flatten trailing dims so the DMA slices are 2D+ (TPU tiling)
    lead, rest = x.shape[0], x.shape[1:]
    flat = x.reshape(lead, -1) if len(rest) != 2 else x
    out = _a2a_call(flat, axis_name=axis_name, num_devices=int(num_devices),
                    collective_id=collective_id)
    return out.reshape(lead, *rest)
