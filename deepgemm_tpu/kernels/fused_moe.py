"""Fused EP dispatch + expert GEMM Pallas kernel.

The reference's mega kernel overlaps NVLink token movement with the L1 expert
GEMM inside one persistent kernel: dispatch warps pull remote token chunks
into a ring buffer while MMA warps consume filled blocks
(/root/reference/deep_gemm/include/deep_gemm/impls/sm100_fp8_fp4_mega_moe.cuh:432-877).

This kernel is the TPU-native analog of that phase-1 structure, at slab
(per-source-rank) granularity:

  * grid step (s, e, j) processes source rank ``(my - s) mod D``, local
    expert ``e``, n-tile ``j``;
  * at the FIRST grid step every peer push is launched (one-sided remote DMA
    of this rank's per-destination slab into the destination's recv buffer —
    the symmetric-memory analog), plus a local copy of our own slab;
  * slab ``s``'s first compute step WAITS on its recv semaphore — every
    later slab is still in flight over ICI while slab ``s`` runs on the MXU,
    which is exactly the dispatch/compute overlap of the mega kernel;
  * tokens stage HBM -> VMEM via a local async copy once per (s, e), then
    ``j`` n-tiles of the expert GEMM consume them.

Correctness on CPU meshes runs under the distributed Pallas interpreter
(threads + simulated DMA), so the semaphore protocol is exercised in tests.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime.config import is_cpu_backend


def _kernel(*args, num_devices: int, axis_name: str, scaled: bool,
            gran_k: int = 128):
    if scaled:
        (send_ref, sfsend_ref, w_ref, wsf_ref, out_ref, recv_ref, sfrecv_ref,
         x_vmem, xsf_vmem, copy_sem, send_sems, recv_sems,
         sf_send_sems, sf_recv_sems) = args
    else:
        (send_ref, w_ref, out_ref, recv_ref, x_vmem, copy_sem,
         send_sems, recv_sems) = args
    s = pl.program_id(0)
    e = pl.program_id(1)
    j = pl.program_id(2)
    my = jax.lax.axis_index(axis_name)
    nd = num_devices

    def _rdma(p, src_r, dst_r, ssems, rsems, offset=None):
        """Descriptor for an offset-p push: slab for dst=(my+p) into that
        rank's recv[my] (or the mirrored waiter when `offset` names the
        incoming slab's source)."""
        dst = jax.lax.rem(my + p, nd)
        slot = my if offset is None else offset
        return pltpu.make_async_remote_copy(
            src_ref=src_r.at[pl.ds(dst, 1)],
            dst_ref=dst_r.at[pl.ds(slot, 1)],
            send_sem=ssems.at[p],
            recv_sem=rsems.at[p],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL)

    @pl.when((s == 0) & (e == 0) & (j == 0))
    def _():
        # Launch every peer push up front — all slabs ride ICI concurrently
        # while slab 0 (our own tokens) computes.
        for p in range(1, nd):
            _rdma(p, send_ref, recv_ref, send_sems, recv_sems).start()
            if scaled:
                _rdma(p, sfsend_ref, sfrecv_ref, sf_send_sems,
                      sf_recv_sems).start()
        # Own slab: local HBM copy into the recv pool (the reference's
        # local-rank fast path), synchronously — slab 0 computes right away.
        local = pltpu.make_async_copy(send_ref.at[pl.ds(my, 1)],
                                      recv_ref.at[pl.ds(my, 1)], copy_sem)
        local.start()
        local.wait()
        if scaled:
            lsf = pltpu.make_async_copy(sfsend_ref.at[pl.ds(my, 1)],
                                        sfrecv_ref.at[pl.ds(my, 1)], copy_sem)
            lsf.start()
            lsf.wait()

    src = jax.lax.rem(my - s + nd, nd)

    @pl.when((e == 0) & (j == 0) & (s > 0))
    def _():
        # First compute step of slab s: wait until it has landed (recv sem)
        # and our own offset-s push has drained (send sem).
        _rdma(s, send_ref, recv_ref, send_sems, recv_sems,
              offset=src).wait()
        if scaled:
            _rdma(s, sfsend_ref, sfrecv_ref, sf_send_sems, sf_recv_sems,
                  offset=src).wait()

    @pl.when(j == 0)
    def _():
        # Stage expert e's token slab (cap, H) into VMEM once per (s, e).
        stage = pltpu.make_async_copy(recv_ref.at[src, e], x_vmem, copy_sem)
        stage.start()
        stage.wait()
        if scaled:
            ssf = pltpu.make_async_copy(sfrecv_ref.at[src, e], xsf_vmem,
                                        copy_sem)
            ssf.start()
            ssf.wait()

    if not scaled:
        # n-tile of the expert GEMM: (cap, H) @ (bn, H)^T -> (cap, bn)
        out_ref[0, 0] = jax.lax.dot_general(
            x_vmem[:], w_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
    else:
        # Exact f32 promote over gran_k sub-blocks: x fp8 with per-token
        # (1, 128) scales (xsf (cap, ksf)), w fp8 with per-row-expanded
        # k-first scales (wsf block (ksf, bn)).
        hidden = x_vmem.shape[1]
        total = None
        for t in range(hidden // gran_k):
            p = jax.lax.dot_general(
                x_vmem[:, t * gran_k:(t + 1) * gran_k],
                w_ref[0][:, t * gran_k:(t + 1) * gran_k],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            term = (p * wsf_ref[0][t:t + 1, :]) * xsf_vmem[:, t:t + 1]
            total = term if total is None else total + term
        out_ref[0, 0] = total.astype(out_ref.dtype)


def _call(send_x, w, *, axis_name: str, num_devices: int, block_n: int,
          collective_id: int, send_sf=None, w_sf_t=None):
    ep, e_local, cap, hidden = send_x.shape
    n = w.shape[1]
    nt = n // block_n
    scaled = send_sf is not None
    kernel = functools.partial(_kernel, num_devices=num_devices,
                               axis_name=axis_name, scaled=scaled)
    interpret = pltpu.InterpretParams() if is_cpu_backend() else False

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]        # send slabs (HBM)
    inputs = [send_x]
    if scaled:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # send sf (HBM)
        inputs.append(send_sf)
    in_specs.append(pl.BlockSpec((1, block_n, hidden),
                                 lambda s, e, j: (e, j, 0),
                                 memory_space=pltpu.VMEM))   # weights
    inputs.append(w)
    if scaled:
        ksf = w_sf_t.shape[1]
        in_specs.append(pl.BlockSpec((1, ksf, block_n),
                                     lambda s, e, j: (e, 0, j),
                                     memory_space=pltpu.VMEM))  # w sf (k-first)
        inputs.append(w_sf_t)

    out_specs = [
        pl.BlockSpec((1, 1, cap, block_n), lambda s, e, j: (e, s, 0, j),
                     memory_space=pltpu.VMEM),               # gemm out
        pl.BlockSpec(memory_space=pltpu.ANY),                # recv pool (HBM)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((e_local, ep, cap, n), jnp.bfloat16),
        jax.ShapeDtypeStruct(send_x.shape, send_x.dtype),
    ]
    scratch = [
        pltpu.VMEM((cap, hidden), send_x.dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((num_devices,)),
        pltpu.SemaphoreType.DMA((num_devices,)),
    ]
    if scaled:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))   # sf recv
        out_shape.append(jax.ShapeDtypeStruct(send_sf.shape, send_sf.dtype))
        scratch.insert(1, pltpu.VMEM((cap, send_sf.shape[-1]), jnp.float32))
        scratch += [pltpu.SemaphoreType.DMA((num_devices,)),
                    pltpu.SemaphoreType.DMA((num_devices,))]

    res = pl.pallas_call(
        kernel,
        grid=(num_devices, e_local, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=collective_id,
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
        ),
        interpret=interpret,
    )(*inputs)
    return res[0], res[1]


def fused_dispatch_gemm(send_x: jnp.ndarray, w: jnp.ndarray,
                        axis_name: str = 'ep', block_n: int = 256,
                        collective_id: int = 7,
                        send_sf: jnp.ndarray = None,
                        w_sf: jnp.ndarray = None):
    """Fused EP dispatch + L1 expert GEMM (inside shard_map over
    ``axis_name``).

    send_x [D, E_local, cap, H]: slab d holds the tokens this rank routes to
    rank d (slot layout identical to the unfused path); w [E_local, N, H].
    FP8 mode: send_x fp8 with per-token (1, 128) ``send_sf``
    [D, E_local, cap, ceil(H/128)] f32 (pushed over ICI alongside the
    tokens — the analog of the mega kernel's fused-SF token payload,
    sm100_fp8_fp4_mega_moe.cuh), and ``w_sf`` [E_local, N/128, ceil(H/128)]
    per-block scales; scales apply through the exact f32 promote epilogue.
    Returns (out [E_local, D, cap, N] bf16, recv [D, E_local, cap, H]) where
    out[e, src] = recv_tokens_from(src)[e] @ w[e]^T and recv is the gathered
    token pool (the analog of the mega kernel's token ring, reusable by the
    caller for the combine phase's source bookkeeping).
    """
    num_devices = int(jax.lax.psum(1, axis_name))
    assert send_x.ndim == 4 and send_x.shape[0] == num_devices
    n = w.shape[1]
    hidden = send_x.shape[-1]
    if n % block_n != 0:
        block_n = n
    w_sf_t = None
    if send_sf is not None:
        assert hidden % 128 == 0, hidden
        # per-block w scales -> per-row, k-first [E_local, ksf, N]
        w_sf_t = jnp.repeat(w_sf.astype(jnp.float32), 128, axis=1)[:, :n] \
            .transpose(0, 2, 1)
        send_sf = send_sf.astype(jnp.float32)
    out, recv = _call(send_x, w, axis_name=axis_name,
                      num_devices=num_devices, block_n=block_n,
                      collective_id=collective_id,
                      send_sf=send_sf, w_sf_t=w_sf_t)
    # The kernel writes slab results in PROCESSING-STEP order (step s holds
    # the slab from rank (my - s) mod D); remap to source-rank order so the
    # caller's combine bookkeeping is rank-indexed like the unfused path.
    my = jax.lax.axis_index(axis_name)
    src_to_step = jnp.mod(my - jnp.arange(num_devices), num_devices)
    out = jnp.take(out, src_to_step, axis=1)
    return out, recv
