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

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime.config import interpret_params, is_cpu_backend
from .common import ici_entry_barrier


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
        # Entry barrier (the nvlink_barrier analog), then launch every peer
        # push up front — all slabs ride ICI concurrently while slab 0 (our
        # own tokens) computes.
        ici_entry_barrier(axis_name, nd)
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
    interpret = interpret_params() if is_cpu_backend() else False

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]        # send slabs (HBM)
    inputs = [send_x]
    if scaled:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # send sf (HBM)
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
        pl.BlockSpec(memory_space=pl.ANY),                # recv pool (HBM)
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
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # sf recv
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
            # collective_id names the entry-barrier semaphore; Mosaic
            # rejects it when no barrier is used (the D=1 no-peer case)
            collective_id=collective_id if num_devices > 1 else None,
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
        ),
        interpret=interpret,
    )(*inputs)
    return res[0], res[1]


def _decode_fp4_chunk(wp, c, gran_k):
    """One gran_k-wide k-chunk of a planar-128-packed FP4 weight tile,
    decoded to fp8 e4m3. Planar packing (utils/math.py:pack_fp4_planar)
    stores each 256-code k-group as 128 bytes — codes [0,128) in the low
    nibbles, [128,256) in the high — so chunk ``c`` (gran_k = 128) is a
    STATIC 128-byte slice + a parity-selected nibble (c is a Python int in
    the unrolled promote loop; no dynamic lane indexing). e2m1 values are
    all exactly representable in e4m3, so the fp8 cast is EXACT and the
    subsequent dot chain is bit-identical to the FP8 kernel fed pre-decoded
    weights — the property the FP4-mega bitwise contract rests on
    (reference: MmaKind::MXFP8FP4, impls/sm100_fp8_fp4_mega_moe.cuh:51-64)."""
    assert gran_k == 128, gran_k
    byte0 = (c // 2) * 128
    b = wp[:, byte0:byte0 + 128].astype(jnp.int32)
    code = (b >> (4 * (c % 2))) & 0xF
    m = (code & 1).astype(jnp.float32)
    e = ((code >> 1) & 3).astype(jnp.float32)
    s = ((code >> 3) & 1).astype(jnp.float32)
    mag = jnp.where(e == 0, 0.5 * m, (1 + 0.5 * m) * jnp.exp2(e - 1))
    # Code 0x8 (negative zero) decodes to +0.0, matching the reference
    # dequant and utils/math._dequantize_from_fp4_e2m1 (sign applied only
    # when value_idx != 0) so all-signed-zero accumulations stay bitwise
    # vs the pre-decoded-fp8 baseline (ADVICE r4).
    return jnp.where((s > 0) & ((code & 7) != 0), -mag, mag) \
        .astype(jnp.float8_e4m3fn)


def _promote_dot(xq, wq, sfa_at, wsf, gran_k, w_fp4: bool = False):
    # Exact f32 promote over gran_k sub-blocks — same term ordering as
    # kernels/common.py:promote_block so results match the unfused
    # masked-kernel path bitwise when block_k covers k. ``sfa_at(c)``
    # yields the chunk's per-row (cap, 1) scale column — or None when x is
    # an UNSCALED bf16 operand (the act-bf16 L2: mixed bf16 x fp8 dot, only
    # the weight scale applies). ``w_fp4``: wq is a planar-packed FP4 tile
    # (k bytes halved); chunks decode to fp8 in-VPU.
    total = None
    for c in range(xq.shape[1] // gran_k):
        w_chunk = (_decode_fp4_chunk(wq, c, gran_k) if w_fp4
                   else wq[:, c * gran_k:(c + 1) * gran_k])
        p = jax.lax.dot_general(
            xq[:, c * gran_k:(c + 1) * gran_k],
            w_chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        term = p * wsf[c:c + 1, :]
        if sfa_at is not None:
            term = term * sfa_at(c)
        total = term if total is None else total + term
    return total


def _plain_dot(xv, wv):
    return jax.lax.dot_general(
        xv, wv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _silu(x, default_impl: str = 'exp'):
    """SiLU with a pinnable lowering (read at trace time).

    The epilogue's exp is the one VPU transcendental in the fused mega's
    single issue stream. Measured on-chip at serving dims (D=1, bf16-act):
    exp 565.7 us/iter, tanh-form 562.8, no-silu floor 562.6 — the tanh
    lowering recovers the WHOLE transcendental exposure (Mosaic's tanh is
    cheaper than its exp) and is f32-identical (on-device calc_diff 6e-8).
    Default 'tanh' in the bf16-act tolerance path; the bitwise contracts
    (BF16 unscaled / act_fp8) keep jax.nn.silu to match the unfused
    swiglu_apply_weight chain bit-for-bit. DGT_MEGA_SILU pins:
      'exp'    — jax.nn.silu, x * logistic(x)
      'tanh'   — x * (0.5*tanh(0.5x) + 0.5), mathematically equal
                 (XLA's own TPU rewrite of logistic)
      'nosilu' — identity (WRONG RESULTS; exposure isolation only)
    """
    import os as _os
    impl = _os.environ.get('DGT_MEGA_SILU', default_impl)
    if impl == 'tanh':
        return x * (0.5 * jnp.tanh(0.5 * x) + 0.5)
    if impl == 'nosilu':
        return x
    return jax.nn.silu(x)


def _l1_epilogue(gu, rw_col, act_vmem, actsf_vmem, *, bn1, col0, scaled,
                 gran_k, clamp):
    """SwiGLU + topk weight (+in-kernel FP8 requant) from the merged
    (cap, 2*bn1) gate|up dot result — the epilogue the reference fuses at
    sm100_fp8_fp4_mega_moe.cuh:938-1132. Shared by the general (RDMA) and
    D=1 local kernels so the two are bitwise-identical.

    When ``act_vmem`` is bf16 in scaled mode (the act-bf16 policy, see
    fused_mega_moe), the FP8 requant is SKIPPED: the reference requants
    because SM100's MMA needs fp8 operands, but the v5e MXU runs bf16 at
    the same rate and the act never leaves VMEM — the requant chain
    (per-chunk amax reduce + scale + cast) is pure VPU overhead here
    (phase-profiled: the in-kernel epilogue exposed ~43 us/call at serving
    dims, the fused-vs-unfused gap)."""
    gate, up = gu[:, :bn1], gu[:, bn1:]
    act_bf16 = scaled and act_vmem.dtype == jnp.bfloat16
    if not act_bf16:
        # Mirror the unfused dataflow bit-for-bit: the masked L1 kernel
        # emits bf16, swiglu consumes it in f32 (swiglu_apply_weight). The
        # BF16 (unscaled) mode's fused-vs-unfused BITWISE contract rests on
        # these casts.
        gate = gate.astype(jnp.bfloat16).astype(jnp.float32)
        up = up.astype(jnp.bfloat16).astype(jnp.float32)
    # else: the bf16-act mode is tolerance-contracted anyway — skipping the
    # bf16 round-trip drops 2 casts x (cap, 2*bn1) x nt1 tiles of pure VPU
    # work from the single issue stream (~17 us/call at serving dims) and
    # is again MORE precise (silu consumes the dot's full-f32 result).
    if act_bf16:
        # The clamp is part of the COMPUTED function, not just fp8-range
        # protection: the reference epilogue always clamps silu(gate)*up at
        # ±clamp (sm100_fp8_fp4_mega_moe.cuh epilogue), and activation
        # outliers past it are real in MoE models — so the bf16-act mode
        # keeps it (2 VPU ops/element, measured noise next to the 17us cast
        # savings; ADVICE r4). Only the requant chain is skipped here.
        act = jnp.clip(_silu(gate, 'tanh') * up, -clamp, clamp) * rw_col
    else:
        act = jnp.clip(_silu(gate) * up, -clamp, clamp) * rw_col
    if scaled and not act_bf16:
        # In-kernel per-token (1, gran_k) FP8 requant — exact semantics of
        # utils/math.py:per_token_cast_to_fp8 from bf16 values.
        v = act.astype(jnp.bfloat16)
        for c in range(bn1 // gran_k):
            chunk = v[:, c * gran_k:(c + 1) * gran_k]
            amax = jnp.clip(jnp.max(jnp.abs(chunk).astype(jnp.float32),
                                    axis=1, keepdims=True), 1e-4, None)
            sf = amax / 448.0
            q = jnp.clip(chunk * (1.0 / sf),
                         -448.0, 448.0).astype(jnp.float8_e4m3fn)
            act_vmem[:, pl.ds(col0 + c * gran_k, gran_k)] = q
            # act scales live with the k-step as the LEADING (untiled)
            # dim: a dynamic lane-dim column store is Mosaic-illegal on
            # real TPU (interpret mode accepts it — the known trap).
            actsf_vmem[pl.ds(col0 // gran_k + c, 1)] = sf[None]
    else:
        act_vmem[:, pl.ds(col0, bn1)] = act.astype(jnp.bfloat16)


def _mega_kernel(*args, num_devices: int, axis_name: str, scaled: bool,
                 e_local: int, nt1: int, nt2: int, bn1: int, bh2: int,
                 pool: int, cap: int, gran_k: int = 128,
                 clamp: float = 256.0, w_fp4: bool = False,
                 act_fp8: bool = True):
    """Fully-fused mega MoE kernel body: phases 1-3 of the reference kernel
    (/root/reference/deep_gemm/include/deep_gemm/impls/sm100_fp8_fp4_mega_moe.cuh:
    dispatch :432-877, SwiGLU/requant epilogue :938-1132, L2 :1144-1233,
    combine push :1246-1384) in one Pallas program.

    Grid (sp, e, t): slab POOL sp (``pool`` consecutive processing steps —
    the wave-pool, see ``pick_wave_pool``), local expert e, inner tile t.
    Each (sp, e) stages ``pool * cap`` token rows into VMEM and runs them
    through every weight tile in ONE dot, so expert weights stream from HBM
    D/pool times per forward instead of D times. t < nt1 runs paired gate/up
    L1 tiles + SwiGLU (+in-kernel FP8 requant); t >= nt1 runs L2 output
    tiles from the VMEM act buffer; the last t of each (sp, e) RDMA-pushes
    the finished BF16 slabs back to their source ranks' combine buffers.
    Dispatch pushes launch at the first grid step; combine pushes drain at
    the last — every transfer rides ICI under MXU work.
    """
    if scaled and act_fp8:
        (send_ref, sfsend_ref, rw_ref, w1_ref, w1sf_ref, w2_ref, w2sf_ref,
         combine_ref, recv_ref, sfrecv_ref, ystage_ref,
         x_vmem, xsf_vmem, act_vmem, actsf_vmem, y_tile,
         copy_sem, ycopy_sems, send_sems, recv_sems,
         sf_send_sems, sf_recv_sems, ysend_sems, yrecv_sems) = args
    elif scaled:
        (send_ref, sfsend_ref, rw_ref, w1_ref, w1sf_ref, w2_ref, w2sf_ref,
         combine_ref, recv_ref, sfrecv_ref, ystage_ref,
         x_vmem, xsf_vmem, act_vmem, y_tile,
         copy_sem, ycopy_sems, send_sems, recv_sems,
         sf_send_sems, sf_recv_sems, ysend_sems, yrecv_sems) = args
        actsf_vmem = None
    else:
        (send_ref, rw_ref, w1_ref, w2_ref,
         combine_ref, recv_ref, ystage_ref,
         x_vmem, act_vmem, y_tile,
         copy_sem, ycopy_sems, send_sems, recv_sems,
         ysend_sems, yrecv_sems) = args
    sp = pl.program_id(0)
    e = pl.program_id(1)
    t = pl.program_id(2)
    my = jax.lax.axis_index(axis_name)
    nd = num_devices
    t_last = nt1 + nt2 - 1
    npool = nd // pool

    def _slab(i):
        # processing step (slab index) i of pool sp, and its source rank
        s_i = sp * pool + i
        return s_i, jax.lax.rem(my - s_i + nd, nd)

    def _rdma(p, src_r, dst_r, ssems, rsems, offset=None):
        dst = jax.lax.rem(my + p, nd)
        slot = my if offset is None else offset
        return pltpu.make_async_remote_copy(
            src_ref=src_r.at[pl.ds(dst, 1)],
            dst_ref=dst_r.at[pl.ds(slot, 1)],
            send_sem=ssems.at[p],
            recv_sem=rsems.at[p],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL)

    @pl.when((sp == 0) & (e == 0) & (t == 0))
    def _():
        # Entry barrier (the nvlink_barrier analog, required by Mosaic for
        # collective_id), then dispatch: every peer push launches up front;
        # all slabs ride ICI while slab 0 (our own tokens) computes.
        ici_entry_barrier(axis_name, nd)
        for p in range(1, nd):
            _rdma(p, send_ref, recv_ref, send_sems, recv_sems).start()
            if scaled:
                _rdma(p, sfsend_ref, sfrecv_ref, sf_send_sems,
                      sf_recv_sems).start()
        local = pltpu.make_async_copy(send_ref.at[pl.ds(my, 1)],
                                      recv_ref.at[pl.ds(my, 1)], copy_sem)
        local.start()
        local.wait()
        if scaled:
            lsf = pltpu.make_async_copy(sfsend_ref.at[pl.ds(my, 1)],
                                        sfrecv_ref.at[pl.ds(my, 1)], copy_sem)
            lsf.start()
            lsf.wait()

    @pl.when((e == 0) & (t == 0))
    def _():
        # First compute step of pool sp: wait for every slab in the pool to
        # land + our own same-offset pushes to drain. (Slab 0 is our local
        # copy, waited synchronously at dispatch; only pool 0's slab-0 entry
        # skips the RDMA wait.)
        def _wait_slab(s_i, src_i):
            _rdma(s_i, send_ref, recv_ref, send_sems, recv_sems,
                  offset=src_i).wait()
            if scaled:
                _rdma(s_i, sfsend_ref, sfrecv_ref, sf_send_sems,
                      sf_recv_sems, offset=src_i).wait()

        for i in range(pool):
            s_i, src_i = _slab(i)
            if i == 0:
                @pl.when(sp > 0)
                def _(s_i=s_i, src_i=src_i):
                    _wait_slab(s_i, src_i)
            else:
                _wait_slab(s_i, src_i)

    @pl.when(t == 0)
    def _():
        # Stage expert e's pooled token rows (pool * cap, H) into VMEM once
        # per (sp, e) — pool slab copies, overlapped, then one joint wait.
        copies = []
        for i in range(pool):
            s_i, src_i = _slab(i)
            stage = pltpu.make_async_copy(
                recv_ref.at[src_i, e], x_vmem.at[pl.ds(i * cap, cap)],
                copy_sem)
            stage.start()
            copies.append(stage)
            if scaled:
                ssf = pltpu.make_async_copy(
                    sfrecv_ref.at[src_i, e],
                    xsf_vmem.at[pl.ds(i * cap, cap)], copy_sem)
                ssf.start()
                copies.append(ssf)
        for c in copies:
            c.wait()

    @pl.when(t < nt1)
    def _l1():
        # Tile-paired gate|up L1: ONE dot of n = 2*bn1 against the host-paired
        # w1 tile (gate rows then up rows of the same n-tile) replaces the two
        # bn1-wide dots — half the dot launches, same column values bitwise
        # (rows/cols of a dot are independent; the k-chunk accumulate order is
        # unchanged).
        col0 = jnp.minimum(t, nt1 - 1) * bn1
        if scaled:
            gu = _promote_dot(x_vmem[:], w1_ref[0, 0],
                              lambda c: xsf_vmem[:, c:c + 1],
                              w1sf_ref[0, 0], gran_k, w_fp4=w_fp4)
        else:
            gu = _plain_dot(x_vmem[:], w1_ref[0, 0])
        _l1_epilogue(gu, rw_ref[0, 0], act_vmem,
                     actsf_vmem if scaled else None,
                     bn1=bn1, col0=col0, scaled=scaled, gran_k=gran_k,
                     clamp=clamp)

    def _ycopies(j, slot):
        # local HBM writes of one finished y tile, one per pooled slab
        # (double-buffered: a full (pool * cap, H) y buffer at serving dims
        # costs VMEM the L1 weight tiles need more)
        out = []
        for i in range(pool):
            s_i, _ = _slab(i)
            out.append(pltpu.make_async_copy(
                y_tile.at[slot, pl.ds(i * cap, cap)],
                ystage_ref.at[s_i, e, :, pl.ds(j * bh2, bh2)],
                ycopy_sems.at[slot]))
        return out

    @pl.when(t >= nt1)
    def _l2():
        # L2 output tile from the full VMEM act buffer (:1144-1233).
        j2 = jnp.clip(t - nt1, 0, nt2 - 1)
        slot = jax.lax.rem(j2, 2)
        if nt2 > 2:
            @pl.when(j2 >= 2)
            def _():
                # same-parity buffer reuse: its copies must have drained
                for c in _ycopies(j2 - 2, slot):
                    c.wait()
        if scaled:
            y = _promote_dot(act_vmem[:], w2_ref[0],
                             (lambda c: actsf_vmem[c]) if act_fp8 else None,
                             w2sf_ref[0], gran_k, w_fp4=w_fp4)
        else:
            y = _plain_dot(act_vmem[:], w2_ref[0])
        y_tile[pl.ds(slot, 1)] = y.astype(jnp.bfloat16)[None]
        for c in _ycopies(j2, slot):
            c.start()

    @pl.when(t == t_last)
    def _push():
        # Combine push (:1246-1384): stage the finished BF16 slabs to HBM,
        # then one-sided RDMA back to each source rank's combine buffer at
        # slot [my, e] (sender-rank-indexed — the same layout the unfused
        # path's reverse all-to-all produces). The pushes overlap the next
        # (sp, e) step's MXU work; drained at the final grid step.
        for c in _ycopies(nt2 - 1, (nt2 - 1) % 2):
            c.wait()
        if nt2 >= 2:
            for c in _ycopies(nt2 - 2, (nt2 - 2) % 2):
                c.wait()

        def _ypush(s_i, src_i):
            idx = s_i * e_local + e
            return pltpu.make_async_remote_copy(
                src_ref=ystage_ref.at[s_i, e],
                dst_ref=combine_ref.at[my, e],
                send_sem=ysend_sems.at[idx],
                recv_sem=yrecv_sems.at[idx],
                device_id=src_i,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

        for i in range(pool):
            s_i, src_i = _slab(i)
            if i == 0:
                # slab sp*pool+0 is slab 0 (our own tokens) only in pool 0
                @pl.when(sp == 0)
                def _(s_i=s_i):
                    lc = pltpu.make_async_copy(ystage_ref.at[s_i, e],
                                               combine_ref.at[my, e],
                                               copy_sem)
                    lc.start()
                    lc.wait()

                @pl.when(sp > 0)
                def _(s_i=s_i, src_i=src_i):
                    _ypush(s_i, src_i).start()
            else:
                _ypush(s_i, src_i).start()

    @pl.when((sp == npool - 1) & (e == e_local - 1) & (t == t_last))
    def _drain():
        # Final barrier: all our combine sends drained, all peers' results
        # landed. Peer (my+step) processed our tokens at ITS slab step `step`,
        # so its push targeted our yrecv[step * e_local + ee].
        for step in range(1, nd):
            peer = jax.lax.rem(my + step, nd)
            for ee in range(e_local):
                idx = step * e_local + ee
                waiter = pltpu.make_async_remote_copy(
                    src_ref=ystage_ref.at[step, ee],
                    dst_ref=combine_ref.at[peer, ee],
                    send_sem=ysend_sems.at[idx],
                    recv_sem=yrecv_sems.at[idx],
                    device_id=peer,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                waiter.wait()


def _mega_kernel_local(*args, scaled: bool, nt1: int, nt2: int, bn1: int,
                       gran_k: int, clamp: float, w_fp4: bool = False,
                       act_fp8: bool = True):
    """D=1 specialization of the mega kernel: no peers means no RDMA, no recv
    pool, no staging copies. x/xsf/rw/weights all arrive as prefetched
    BlockSpec tiles and y tiles write back through the output BlockSpec —
    Mosaic pipelines every transfer under the MXU work. The compute sequence
    (_promote_dot + _l1_epilogue) is shared with the general kernel, so the
    two are bitwise-identical at D=1."""
    if scaled and act_fp8:
        (x_ref, xsf_ref, rw_ref, w1_ref, w1sf_ref, w2_ref, w2sf_ref,
         y_ref, act_vmem, actsf_vmem) = args
    elif scaled:
        (x_ref, xsf_ref, rw_ref, w1_ref, w1sf_ref, w2_ref, w2sf_ref,
         y_ref, act_vmem) = args
        actsf_vmem = None
    else:
        (x_ref, rw_ref, w1_ref, w2_ref, y_ref, act_vmem) = args
        actsf_vmem = None
    t = pl.program_id(1)

    # x / xsf / rw / y ride DENSE-STYLE 2D blocks over [E*cap, .] arrays
    # (the expert id folds into the m-tile index): the full-occupancy-
    # reroute lesson — leading-1 3D blocks carry the same Mosaic machinery
    # cost as scalar prefetch (masked 171.1 vs contiguous-static 175.0 at
    # the bench shape). Weight tiles keep their leading-1 blocks (as in the
    # contiguous kernel, where they are free).
    @pl.when(t < nt1)
    def _l1():
        col0 = jnp.minimum(t, nt1 - 1) * bn1
        if scaled:
            gu = _promote_dot(x_ref[:], w1_ref[0, 0],
                              lambda c: xsf_ref[:, c:c + 1],
                              w1sf_ref[0, 0], gran_k, w_fp4=w_fp4)
        else:
            gu = _plain_dot(x_ref[:], w1_ref[0, 0])
        _l1_epilogue(gu, rw_ref[:], act_vmem, actsf_vmem,
                     bn1=bn1, col0=col0, scaled=scaled, gran_k=gran_k,
                     clamp=clamp)

    @pl.when(t >= nt1)
    def _l2():
        if scaled:
            y = _promote_dot(act_vmem[:], w2_ref[0],
                             (lambda c: actsf_vmem[c]) if act_fp8 else None,
                             w2sf_ref[0], gran_k, w_fp4=w_fp4)
        else:
            y = _plain_dot(act_vmem[:], w2_ref[0])
        y_ref[:] = y.astype(jnp.bfloat16)


def _mega_local_call(x, xsf, rw3, w1p, w1sf_t, w2, w2sf_t, *, cap, hidden,
                     inter, e_local, nt1, nt2, bn1, bh2, gran_k, clamp,
                     scaled, interpret, w_fp4: bool = False,
                     act_fp8: bool = True):
    """Build + run the D=1 local mega kernel. Returns y [E_local, cap, H]."""
    kernel = functools.partial(
        _mega_kernel_local, scaled=scaled, nt1=nt1, nt2=nt2, bn1=bn1,
        gran_k=gran_k, clamp=clamp, w_fp4=w_fp4, act_fp8=act_fp8)
    wk1 = hidden // 2 if w_fp4 else hidden     # w tile k bytes (planar FP4
    wk2 = inter // 2 if w_fp4 else inter       # packs 2 codes per int8)
    # x/xsf/rw/y as flat [E*cap, .] arrays with dense-style 2D blocks (see
    # the kernel docstring note); row block e = expert e's cap rows.
    in_specs = [pl.BlockSpec((cap, hidden), lambda e, t: (e, 0),
                             memory_space=pltpu.VMEM)]         # x
    inputs = [x.reshape(e_local * cap, hidden)]
    if scaled:
        in_specs.append(pl.BlockSpec((cap, xsf.shape[-1]),
                                     lambda e, t: (e, 0),
                                     memory_space=pltpu.VMEM))  # x scales
        inputs.append(xsf.reshape(e_local * cap, xsf.shape[-1]))
    in_specs.append(pl.BlockSpec((cap, 1), lambda e, t: (e, 0),
                                 memory_space=pltpu.VMEM))      # row weights
    inputs.append(rw3.reshape(e_local * cap, 1))
    in_specs.append(pl.BlockSpec(
        (1, 1, 2 * bn1, wk1),
        lambda e, t: (e, jnp.minimum(t, nt1 - 1), 0, 0),
        memory_space=pltpu.VMEM))                               # w1 paired
    inputs.append(w1p)
    if scaled:
        ksf1 = hidden // gran_k
        in_specs.append(pl.BlockSpec(
            (1, 1, ksf1, 2 * bn1),
            lambda e, t: (e, jnp.minimum(t, nt1 - 1), 0, 0),
            memory_space=pltpu.VMEM))
        inputs.append(w1sf_t)
    in_specs.append(pl.BlockSpec(
        (1, bh2, wk2),
        lambda e, t: (e, jnp.clip(t - nt1, 0, nt2 - 1), 0),
        memory_space=pltpu.VMEM))                               # w2
    inputs.append(w2)
    if scaled:
        ksf2 = inter // gran_k
        in_specs.append(pl.BlockSpec(
            (1, ksf2, bh2),
            lambda e, t: (e, 0, jnp.clip(t - nt1, 0, nt2 - 1)),
            memory_space=pltpu.VMEM))
        inputs.append(w2sf_t)
    out_spec = pl.BlockSpec(
        (cap, bh2), lambda e, t: (e, jnp.clip(t - nt1, 0, nt2 - 1)),
        memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((cap, inter),
                          jnp.float8_e4m3fn if scaled and act_fp8
                          else jnp.bfloat16)]
    if scaled and act_fp8:
        scratch.append(pltpu.VMEM((inter // gran_k, cap, 1), jnp.float32))
    y = pl.pallas_call(
        kernel,
        grid=(e_local, nt1 + nt2),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((e_local * cap, hidden),
                                       jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
        ),
        interpret=interpret,
    )(*inputs)
    return y.reshape(e_local, cap, hidden)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MegaPackedWeights:
    """Load-time weight transform for the fused mega kernel — the TPU analog
    of the reference's `transform_weights_for_mega_moe` one-shot layout pass
    (/root/reference/deep_gemm/mega/__init__.py:115-151). The tile-paired w1
    repack is a ~2x-weight-bytes HBM transpose: done per-call inside a jitted
    serving/training step it costs more than the kernel saves (measured: the
    in-loop repack dropped the D=1 serving-dims kernel from 143 to 61
    TFLOPS), so pack ONCE at weight-load time and pass the result to
    ``fused_mega_moe(packed=...)``."""
    w1p: jnp.ndarray                 # [E, nt1, 2*bn1, H] tile-paired gate|up
    w2: jnp.ndarray                  # [E, H, I] (unchanged layout)
    w1sf_t: object                   # [E, nt1, ksf1, 2*bn1] f32 or None
    w2sf_t: object                   # [E, ksf2, H] f32 or None
    bn1: int = dataclasses.field(metadata=dict(static=True), default=0)
    bh2: int = dataclasses.field(metadata=dict(static=True), default=0)
    gran_k: int = dataclasses.field(metadata=dict(static=True), default=128)
    pool: int = dataclasses.field(metadata=dict(static=True), default=1)
    # Weights kept as planar-128-packed FP4 (int8, 2 e2m1 codes/byte; k dims
    # halved) — decoded to fp8 per k-chunk INSIDE the kernel. Halves the
    # expert-weight HBM footprint AND stream traffic (the reference mega's
    # MmaKind::MXFP8FP4, impls/sm100_fp8_fp4_mega_moe.cuh:51-64).
    w_fp4: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Act dtype between L1 and L2 (scaled mode): False = keep bf16 and skip
    # the in-kernel FP8 requant (see _l1_epilogue — the v5e MXU runs bf16 at
    # fp8 rate and act never leaves VMEM, so the requant is pure VPU
    # overhead); True = the reference's requantized dataflow.
    act_fp8: bool = dataclasses.field(metadata=dict(static=True),
                                      default=True)


def _resolve_act_fp8(act_fp8) -> bool:
    """Act dtype policy between the mega kernel's L1 and L2 (scaled mode).

    Default FALSE on TPU: keep act bf16 and SKIP the in-kernel FP8 requant.
    The reference requants because SM100's MMA needs fp8 operands
    (sm100_fp8_fp4_mega_moe.cuh:938-1132); the v5e MXU runs bf16 at the fp8
    rate and act never leaves VMEM, so the requant chain is pure VPU
    overhead (phase-profiled ~43 us/call at serving dims — the whole
    fused-vs-unfused gap). act_fp8=True restores the reference's
    requantized dataflow (and halves act VMEM, for VMEM-tight configs);
    DGT_MEGA_ACT_FP8={0,1} pins it for A/B runs."""
    import os as _os
    env = _os.environ.get('DGT_MEGA_ACT_FP8')
    if env is not None:
        return env == '1'
    if act_fp8 is None:
        return False
    return bool(act_fp8)


def pack_mega_weights(w1: jnp.ndarray, w2: jnp.ndarray,
                      w1_sf=None, w2_sf=None, *, cap: int,
                      x_dtype=jnp.float8_e4m3fn, num_devices: int = 1,
                      block_n: int = 0, block_h: int = 0,
                      gran_k: int = 128,
                      w_packed_fp4: bool = False,
                      act_fp8: bool = None) -> MegaPackedWeights:
    """Pack mega-MoE weights into the fused kernel's preferred layout ONCE
    (at load time). ``cap``/``x_dtype``/``num_devices`` must match the later
    forward calls — they determine the VMEM-aware tile pick.

    ``w_packed_fp4``: w1/w2 arrive as planar-128-packed FP4 codes
    (int8 [E, 2I, H/2] / [E, H, I/2], utils/math.py:pack_fp4_planar) with
    their per-block SF, and STAY packed in HBM — the kernel decodes each
    k-chunk to fp8 in-VPU (exact: e2m1 ⊂ e4m3), halving the expert-weight
    footprint and stream traffic. The per-arch default for whether serving
    should use this lives in heuristics/arch.py:fp4_inkernel_profitable
    (v5e: decode is VPU-bound, pre-decode to bf16/fp8 at load instead unless
    HBM capacity forces FP4 residency)."""
    if w_packed_fp4:
        assert w1.dtype == jnp.int8 and w2.dtype == jnp.int8, \
            (w1.dtype, w2.dtype)
        assert w1_sf is not None, 'packed-FP4 mega weights require SF'
        e_local, two_i, wk1 = w1.shape
        hidden = wk1 * 2
        inter = two_i // 2
        assert w2.shape == (e_local, hidden, inter // 2), (w2.shape,)
    else:
        e_local, two_i, hidden = w1.shape
        inter = two_i // 2
        assert w2.shape == (e_local, hidden, inter), (w2.shape,)
    scaled = w1_sf is not None
    act_fp8 = _resolve_act_fp8(act_fp8)
    xb = jnp.dtype(x_dtype).itemsize
    wb = jnp.dtype(w1.dtype).itemsize
    pool = 1
    if num_devices > 1:
        pool = pick_wave_pool(num_devices, cap, hidden, inter, xb=xb, wb=wb,
                              scaled=scaled, gran_k=gran_k,
                              block_n=block_n, block_h=block_h,
                              act_fp8=act_fp8)
    bn1, bh2 = pick_mega_tiles(
        hidden, inter, cap, xb=xb, wb=wb, scaled=scaled, gran_k=gran_k,
        block_n=block_n, block_h=block_h, local=num_devices == 1, pool=pool,
        act_fp8=act_fp8)
    nt1 = inter // bn1
    wk1 = hidden // 2 if w_packed_fp4 else hidden
    # (packed FP4: the tile-pair repack permutes n-rows only; the planar k
    # packing rides along untouched in the halved last dim)
    w1p = w1.reshape(e_local, 2, nt1, bn1, wk1) \
        .transpose(0, 2, 1, 3, 4).reshape(e_local, nt1, 2 * bn1, wk1)
    w1sf_t = w2sf_t = None
    if scaled:
        ksf1 = hidden // gran_k
        w1sf_rows = jnp.repeat(w1_sf.astype(jnp.float32), gran_k,
                               axis=1)[:, :two_i]
        w1sf_t = w1sf_rows.transpose(0, 2, 1) \
            .reshape(e_local, ksf1, 2, nt1, bn1) \
            .transpose(0, 3, 1, 2, 4) \
            .reshape(e_local, nt1, ksf1, 2 * bn1)
        w2sf_t = jnp.repeat(w2_sf.astype(jnp.float32), gran_k,
                            axis=1)[:, :hidden].transpose(0, 2, 1)
    return MegaPackedWeights(w1p=w1p, w2=w2, w1sf_t=w1sf_t, w2sf_t=w2sf_t,
                             bn1=bn1, bh2=bh2, gran_k=gran_k, pool=pool,
                             w_fp4=w_packed_fp4, act_fp8=act_fp8)


def _mega_vmem_bytes(b1: int, b2: int, *, hidden: int, inter: int,
                     rows: int, xb: int, wb: int, scaled: bool,
                     gran_k: int, local: bool, act_fp8: bool = True) -> int:
    """Conservative VMEM working-set estimate for the fused mega kernel at
    L1 tile width ``b1``, L2 tile width ``b2`` and ``rows`` token rows per
    MXU pass (``rows = pool * cap`` in the wave-pooled general kernel)."""
    e = (2 * b1 * hidden * wb) * 2          # w1 gate/up pair, dbl-buffered
    e += (b2 * inter * wb) * 2              # w2 tile
    # x: one staging buffer (general) / a double-buffered BlockSpec (local)
    e += rows * hidden * xb * (2 if local else 1)
    e += rows * inter * (1 if scaled and act_fp8 else 2)  # act
    e += 2 * rows * b2 * 2                   # y tile double buffer
    if scaled:
        ksf1_ = ((hidden // gran_k + 127) // 128) * 128
        e += rows * ksf1_ * 4 * (2 if local else 1) \
            + ((inter // gran_k) * rows * 4 if act_fp8 else 0)
        e += 2 * (hidden // gran_k) * b1 * 4 * 2
        e += (inter // gran_k) * b2 * 4 * 2
    return e


def pick_mega_tiles(hidden: int, inter: int, cap: int, *, xb: int, wb: int,
                    scaled: bool, gran_k: int = 128,
                    block_n: int = 0, block_h: int = 0,
                    budget: int = 0, local: bool = False, pool: int = 1,
                    act_fp8: bool = True):
    """VMEM-aware (bn1, bh2) tile pick for the fused mega kernel.

    At serving dims (H 7168, I 2048, cap 128, bn1 = bh2 = 256) the working
    set overflows the ~16 MiB scoped VMEM (measured 16.6M alloc); shrink the
    wider weight tile until the estimate fits a conservative budget (Mosaic's
    allocator adds ~40% overhead on top of the raw block bytes here).

    Every candidate must DIVIDE its axis and stay a multiple of the requant
    granularity / lane tile — naive halving can produce bn1 violating
    ``bn1 % gran_k == 0`` or ``inter % bn1 == 0`` (e.g. inter 640:
    640 -> 320 -> 160), silently leaving stale act_vmem columns for the L2
    GEMM (ADVICE r2).

    ``local=True`` is the D=1 kernel: no recv pool / staging scratch, so the
    budget is higher and wider L2 tiles pay (serving dims measured on v5e:
    (256, 1024) = 154.6 TFLOPS > (256, 512) = 150.0 > (256, 256) = 143.0).

    Candidates prefer powers of two: compile evidence at serving dims is
    that Mosaic's allocator handles po2 widths but fragments on non-po2 —
    (256, 512) and (256, 1024) both compile while (256, 896) RESOURCE-
    EXHAUSTS (16.13M > 16M) despite a *smaller* raw-byte estimate than 1024.
    """
    # Profiling escape hatch (the DGT_KG_TILES analog): pin (bn1, bh2) and
    # skip the VMEM-aware shrink — for candidates the conservative estimate
    # rejects but the real compiler accepts (pre-validate chipless with
    # scripts/aot_check.py first; e.g. (256, 1024) at serving dims compiles
    # while the estimate shrinks it back to 512).
    import os as _os
    _ovr = _os.environ.get('DGT_MEGA_TILES')
    if _ovr:
        bn1, bh2 = (int(v) for v in _ovr.split(','))
        assert inter % bn1 == 0 and hidden % bh2 == 0, (bn1, bh2)
        if scaled:
            assert bn1 % gran_k == 0, (bn1, gran_k)
        return bn1, bh2
    if block_n <= 0:
        block_n = 256
    if block_h <= 0:
        block_h = 1024 if local else 256
    if budget <= 0:
        budget = (15 * 1024 * 1024 if local
                  else 10 * 1024 * 1024 + 512 * 1024)
    bn1 = block_n if inter % block_n == 0 else inter
    bh2 = block_h if hidden % block_h == 0 else hidden
    if scaled:
        assert bn1 % gran_k == 0, bn1

    def _est(b1, b2):
        return _mega_vmem_bytes(b1, b2, hidden=hidden, inter=inter,
                                rows=pool * cap, xb=xb, wb=wb, scaled=scaled,
                                gran_k=gran_k, local=local, act_fp8=act_fp8)

    def _shrink_div(cur, total, quantum):
        # Largest value < cur that divides `total` and is a multiple of
        # `quantum`, preferring powers of two (Mosaic allocator evidence
        # above: po2 widths fit where larger-estimate non-po2 ones overflow).
        p2 = 1 << (cur - 1).bit_length() - 1          # largest po2 < cur
        while p2 >= quantum:
            if p2 % quantum == 0 and total % p2 == 0:
                return p2
            p2 //= 2
        for cand in range(cur - quantum, quantum - 1, -quantum):
            if total % cand == 0:
                return cand
        return None

    q1 = gran_k if scaled else 128
    while _est(bn1, bh2) > budget:
        s1 = _shrink_div(bn1, inter, q1) if bn1 % q1 == 0 else None
        s2 = _shrink_div(bh2, hidden, 128) if bh2 % 128 == 0 else None
        if s1 is not None and (s2 is None or bn1 * 2 * hidden >= bh2 * inter):
            bn1 = s1
        elif s2 is not None:
            bh2 = s2
        else:
            break
    assert inter % bn1 == 0 and hidden % bh2 == 0, (bn1, bh2, inter, hidden)
    if scaled:
        assert bn1 % gran_k == 0, (bn1, gran_k)
    return bn1, bh2


def pick_wave_pool(num_devices: int, cap: int, hidden: int, inter: int, *,
                   xb: int, wb: int, scaled: bool, gran_k: int = 128,
                   block_n: int = 0, block_h: int = 0,
                   act_fp8: bool = True) -> int:
    """Wave-pool size P for the general (D>1) fused mega kernel — the TPU
    analog of the reference's ``get_num_wave_pool_tokens``
    (/root/reference/csrc/jit_kernels/heuristics/mega_moe.hpp:134-185), which
    batches several ranks' token blocks into one MMA wave when tokens/expert
    is small.

    Here a pool of P slabs (P * cap rows) feeds ONE dot per weight tile, so
    every expert's w1/w2 stream from HBM D/P times per step instead of D
    times. At serving dims the kernel is weight-stream bound (the D=1 bound:
    cap=128 rows amortize ~44 MB of expert weights), so the traffic cut is
    the dominant term; the costs are VMEM (x/act/y rows scale with P, which
    the tile pick re-budgets) and a deeper up-front dispatch wait (pool 0
    computes only after slabs 0..P-1 land — ICI time the unpooled kernel
    overlaps with slab-0 compute).

    Policy: the largest power-of-two P <= min(D, 4) that divides D, keeps
    the pooled dot height P * cap within one MXU-friendly pass (<= 1024
    rows), and still fits the general-kernel VMEM budget at the tiles
    ``pick_mega_tiles`` would choose for it. ``DGT_MEGA_POOL`` pins P for
    A/B runs (validate chipless with scripts/aot_check.py first).
    """
    import os as _os
    _ovr = _os.environ.get('DGT_MEGA_POOL')
    if _ovr:
        p = int(_ovr)
        assert p >= 1 and num_devices % p == 0, (p, num_devices)
        return p
    # Feasibility budget calibrated by chipless AOT compiles at serving dims
    # (H 7168, I 2048, cap 128): P=2 (est ~7.6 MiB) compiles, P=4 (est
    # ~9.6 MiB) RESOURCE-EXHAUSTS — the Mosaic allocator overhead on this
    # kernel is ~65%, not the ~40% the tile budget assumes.
    budget = 9 * 1024 * 1024
    for p in (4, 2):
        if p > num_devices or num_devices % p or p * cap > 1024:
            continue
        bn1, bh2 = pick_mega_tiles(
            hidden, inter, cap, xb=xb, wb=wb, scaled=scaled, gran_k=gran_k,
            block_n=block_n, block_h=block_h, local=False, pool=p,
            act_fp8=act_fp8)
        if _mega_vmem_bytes(bn1, bh2, hidden=hidden, inter=inter,
                            rows=p * cap, xb=xb, wb=wb, scaled=scaled,
                            gran_k=gran_k, local=False,
                            act_fp8=act_fp8) <= budget:
            return p
    return 1


def fused_mega_moe(send_x: jnp.ndarray, rw_steps: jnp.ndarray,
                   w1: jnp.ndarray = None, w2: jnp.ndarray = None,
                   axis_name: str = 'ep', *,
                   send_sf: jnp.ndarray = None,
                   w1_sf: jnp.ndarray = None, w2_sf: jnp.ndarray = None,
                   block_n: int = 0, block_h: int = 0,
                   collective_id: int = 8, clamp: float = 256.0,
                   gran_k: int = 128, packed: MegaPackedWeights = None,
                   force_general: bool = False, pool: int = 0,
                   act_fp8: bool = None) -> jnp.ndarray:
    """Fully-fused mega MoE forward (inside shard_map over ``axis_name``):
    EP dispatch + L1 GEMM + SwiGLU/topk-weight (+FP8 requant) + L2 GEMM +
    EP combine push, in ONE Pallas kernel — the TPU analog of the reference's
    flagship fused kernel (sm100_fp8_fp4_mega_moe.cuh:51-1392).

    send_x [D, E_local, cap, H]: slab d = tokens this rank routes to rank d
    (bf16, or fp8 with per-token (1, gran_k) ``send_sf`` f32).
    rw_steps [D, E_local, cap] f32: per-row topk weights in PROCESSING-STEP
    order (step s = tokens from rank (my - s) mod D) — the caller permutes
    the weight all-to-all result (the scalar sideband; the reference ships
    these with the token payload).
    w1 [E_local, 2I, H] gate-first concat; w2 [E_local, H, I]; FP8 weights
    carry per-128x128-block SF (w1_sf/w2_sf).

    Returns ``combine [D, E_local, cap, H]`` bf16 where ``combine[d, e]`` =
    results computed by rank d for the tokens this rank sent to (d, e) —
    exactly the layout of the unfused path's reverse all-to-all, so the
    caller's pair gather + f32 scatter-add is unchanged (and bitwise-equal).
    """
    num_devices = int(jax.lax.psum(1, axis_name))
    d_dim, e_local, cap, hidden = send_x.shape
    assert d_dim == num_devices, (send_x.shape, num_devices)
    w_fp4 = packed is not None and packed.w_fp4
    if packed is not None:
        inter = packed.w2.shape[-1] * (2 if w_fp4 else 1)
        two_i = 2 * inter
        if w_fp4:
            assert send_sf is not None, 'FP4 mega weights require scaling'
    else:
        two_i = w1.shape[1]
        inter = two_i // 2
        assert w1.shape == (e_local, two_i, hidden), (w1.shape,)
        assert w2.shape == (e_local, hidden, inter), (w2.shape,)
    scaled = send_sf is not None
    if scaled:
        assert hidden % gran_k == 0 and inter % gran_k == 0, (hidden, inter)
    local = num_devices == 1 and not force_general
    if packed is not None:
        # Load-time packed weights (pack_mega_weights): skip the per-call
        # repack — the in-loop transpose costs ~2x the weight bytes in HBM
        # traffic and measured 143 -> 61 TFLOPS at serving dims.
        bn1, bh2, gran_k = packed.bn1, packed.bh2, packed.gran_k
        assert pool <= 0 or pool == packed.pool, \
            (pool, packed.pool, 'tiles were budgeted at pack time for '
             'packed.pool — repack to change the wave pool')
        pool = packed.pool
        # act dtype was budgeted at pack time; the pack's choice wins
        act_fp8 = packed.act_fp8
        w1p, w1sf_t, w2sf_t = packed.w1p, packed.w1sf_t, packed.w2sf_t
        w2 = packed.w2
        assert w1p.shape[0] == e_local \
            and w1p.shape[-1] == (hidden // 2 if w_fp4 else hidden), \
            (w1p.shape, e_local, hidden, w_fp4)
        assert scaled == (w1sf_t is not None), \
            'packed weights SF presence must match send_sf'
    else:
        act_fp8 = _resolve_act_fp8(act_fp8)
        xb = jnp.dtype(send_x.dtype).itemsize
        wb = jnp.dtype(w1.dtype).itemsize
        if pool <= 0:
            pool = 1 if local else pick_wave_pool(
                num_devices, cap, hidden, inter, xb=xb, wb=wb, scaled=scaled,
                gran_k=gran_k, block_n=block_n, block_h=block_h,
                act_fp8=act_fp8)
        bn1, bh2 = pick_mega_tiles(
            hidden, inter, cap, xb=xb, wb=wb, scaled=scaled, gran_k=gran_k,
            block_n=block_n, block_h=block_h, local=local, pool=pool,
            act_fp8=act_fp8)
    assert pool >= 1 and num_devices % pool == 0, (pool, num_devices)
    nt1, nt2 = inter // bn1, hidden // bh2

    if packed is None:
        # Tile-paired w1: [E, nt1, 2*bn1, H] where tile t stacks the gate
        # rows then the up rows of n-tile t — lets the kernel run ONE
        # 2*bn1-wide dot per L1 tile instead of two (the gate/up pair
        # merge). NOTE: this repack is a full-weight HBM transpose — inside
        # a hot loop use pack_mega_weights + ``packed=`` instead.
        w1p = w1.reshape(e_local, 2, nt1, bn1, hidden) \
            .transpose(0, 2, 1, 3, 4).reshape(e_local, nt1, 2 * bn1, hidden)
        w1sf_t = w2sf_t = None
        if scaled:
            ksf1 = hidden // gran_k
            # per-block w1 SF -> per-row, k-first, TILE-paired
            # [E, nt1, ksf1, 2*bn1]: tile t's columns are
            # [gate cols | up cols] of n-tile t, matching the paired w1
            # tile's row order.
            w1sf_rows = jnp.repeat(w1_sf.astype(jnp.float32), gran_k,
                                   axis=1)[:, :two_i]          # [E, 2I, ksf1]
            w1sf_t = w1sf_rows.transpose(0, 2, 1) \
                .reshape(e_local, ksf1, 2, nt1, bn1) \
                .transpose(0, 3, 1, 2, 4) \
                .reshape(e_local, nt1, ksf1, 2 * bn1)
            w2sf_t = jnp.repeat(w2_sf.astype(jnp.float32), gran_k,
                                axis=1)[:, :hidden].transpose(0, 2, 1)
    rw4 = rw_steps.astype(jnp.float32).reshape(d_dim, e_local, cap, 1)
    if scaled:
        # The SF slab rides its own RDMA: pad its last dim to the f32 lane
        # tile (128) — Mosaic requires DMA slices lane-aligned on real TPU.
        ksf1 = hidden // gran_k
        ksf_pad = ((ksf1 + 127) // 128) * 128
        send_sf = send_sf.astype(jnp.float32)
        if send_sf.shape[-1] != ksf_pad:
            send_sf = jnp.pad(send_sf, ((0, 0), (0, 0), (0, 0),
                                        (0, ksf_pad - send_sf.shape[-1])))
    interpret = interpret_params() if is_cpu_backend() else False

    if num_devices == 1 and not force_general:
        # D=1 local fast path: there are no peers, so the RDMA machinery, the
        # recv pool, the x staging copy and the ystage+combine copies are all
        # pure overhead (~66 MB of extra HBM traffic per call at serving
        # dims, ~19% of the weight traffic the op is rooflined on). Feed x
        # via a prefetched BlockSpec and write y tiles straight to the
        # combine layout — the reference's local-rank fast path, minus the
        # symmetric buffer entirely. Bitwise-identical math (_promote_dot /
        # _l1_epilogue shared with the general kernel).
        return _mega_local_call(
            send_x[0], send_sf[0] if scaled else None, rw4[0],
            w1p, w1sf_t, w2, w2sf_t,
            cap=cap, hidden=hidden, inter=inter, e_local=e_local,
            nt1=nt1, nt2=nt2, bn1=bn1, bh2=bh2, gran_k=gran_k, clamp=clamp,
            scaled=scaled, interpret=interpret, w_fp4=w_fp4,
            act_fp8=act_fp8)[None]

    kernel = functools.partial(
        _mega_kernel, num_devices=num_devices, axis_name=axis_name,
        scaled=scaled, e_local=e_local, nt1=nt1, nt2=nt2, bn1=bn1, bh2=bh2,
        pool=pool, cap=cap, gran_k=gran_k, clamp=clamp, w_fp4=w_fp4,
        act_fp8=act_fp8)
    npool = num_devices // pool
    # Pooled row-weight layout [npool, E_local, pool*cap, 1]: the P slabs of
    # a pool land stacked in x_vmem, so their topk weights arrive as one
    # (pool*cap, 1) column per (sp, e) block (a host-side relayout of the
    # tiny scalar sideband, not of token payloads).
    rwp = rw4.reshape(npool, pool, e_local, cap, 1) \
        .transpose(0, 2, 1, 3, 4).reshape(npool, e_local, pool * cap, 1)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]          # send (HBM)
    inputs = [send_x]
    if scaled:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # send sf (HBM)
        inputs.append(send_sf)
    in_specs.append(pl.BlockSpec((1, 1, pool * cap, 1),
                                 lambda sp, e, t: (sp, e, 0, 0),
                                 memory_space=pltpu.VMEM))     # row weights
    inputs.append(rwp)
    in_specs.append(pl.BlockSpec(
        (1, 1, 2 * bn1, hidden // 2 if w_fp4 else hidden),
        lambda sp, e, t: (e, jnp.minimum(t, nt1 - 1), 0, 0),
        memory_space=pltpu.VMEM))                              # w1 paired tile
    inputs.append(w1p)
    if scaled:
        in_specs.append(pl.BlockSpec(
            (1, 1, ksf1, 2 * bn1),
            lambda sp, e, t: (e, jnp.minimum(t, nt1 - 1), 0, 0),
            memory_space=pltpu.VMEM))
        inputs.append(w1sf_t)
    in_specs.append(pl.BlockSpec(
        (1, bh2, inter // 2 if w_fp4 else inter),
        lambda sp, e, t: (e, jnp.clip(t - nt1, 0, nt2 - 1), 0),
        memory_space=pltpu.VMEM))                              # w2
    inputs.append(w2)
    if scaled:
        ksf2 = inter // gran_k
        in_specs.append(pl.BlockSpec(
            (1, ksf2, bh2),
            lambda sp, e, t: (e, 0, jnp.clip(t - nt1, 0, nt2 - 1)),
            memory_space=pltpu.VMEM))
        inputs.append(w2sf_t)

    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (4 if scaled else 3)
    out_shape = [
        jax.ShapeDtypeStruct((d_dim, e_local, cap, hidden), jnp.bfloat16),
        jax.ShapeDtypeStruct(send_x.shape, send_x.dtype),      # recv pool
    ]
    if scaled:
        out_shape.append(jax.ShapeDtypeStruct(send_sf.shape, jnp.float32))
    out_shape.append(jax.ShapeDtypeStruct((d_dim, e_local, cap, hidden),
                                          jnp.bfloat16))       # y staging
    scratch = [
        pltpu.VMEM((pool * cap, hidden), send_x.dtype),        # x (pooled)
    ]
    if scaled:
        scratch.append(pltpu.VMEM((pool * cap, send_sf.shape[-1]),
                                  jnp.float32))
    scratch.append(pltpu.VMEM((pool * cap, inter),
                              jnp.float8_e4m3fn if scaled and act_fp8
                              else jnp.bfloat16))
    if scaled and act_fp8:
        # k-step-leading act scales (see the in-kernel store comment)
        scratch.append(pltpu.VMEM((inter // gran_k, pool * cap, 1),
                                  jnp.float32))
    scratch += [
        pltpu.VMEM((2, pool * cap, bh2), jnp.bfloat16),        # y tiles
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((2,)),                         # y tile copies
        pltpu.SemaphoreType.DMA((num_devices,)),
        pltpu.SemaphoreType.DMA((num_devices,)),
    ]
    if scaled:
        scratch += [pltpu.SemaphoreType.DMA((num_devices,)),
                    pltpu.SemaphoreType.DMA((num_devices,))]
    scratch += [pltpu.SemaphoreType.DMA((num_devices * e_local,)),
                pltpu.SemaphoreType.DMA((num_devices * e_local,))]

    res = pl.pallas_call(
        kernel,
        grid=(npool, e_local, nt1 + nt2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # At D=1 no remote DMA is emitted and Mosaic rejects a
            # collective_id without a barrier.
            collective_id=collective_id if num_devices > 1 else None,
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
        ),
        interpret=interpret,
    )(*inputs)
    return res[0]


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
