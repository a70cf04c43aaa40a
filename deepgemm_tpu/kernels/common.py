"""Shared in-kernel helpers for the Pallas GEMM family."""

import jax
import jax.numpy as jnp


def dot_mn(a_blk, b_blk, a_kmajor: bool, b_kmajor: bool):
    """(bm, bn) f32 = contract over k, whatever the block orientations."""
    ca = 1 if a_kmajor else 0
    cb = 1 if b_kmajor else 0
    return jax.lax.dot_general(
        a_blk, b_blk,
        dimension_numbers=(((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32)


def k_slice(blk, kmajor: bool, start: int, size: int):
    return blk[:, start:start + size] if kmajor else blk[start:start + size, :]


def mask_k_tail(blk, kmajor: bool, k_base, k_total: int):
    """Zero out-of-range k entries in a (padded) final k block."""
    ids = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1 if kmajor else 0)
    return jnp.where(k_base + ids < k_total, blk, jnp.zeros_like(blk))


def promote_block(spec, bk: int, k: int, a_blk, b_blk, sfa_blk, sfb_blk):
    """One k-step of the exact FP8 promotion epilogue:

        total = sum_s (a_s @ b_s^T) * sfb[s] (row) * sfa[s] (col)

    over the scale-granularity sub-blocks ``s`` of this ``bk``-deep block —
    reference semantics ``final += (sfa*sfb) * accum`` per 128-wide chunk
    (/root/reference/deep_gemm/include/deep_gemm/impls/sm90_fp8_gemm_1d2d.cuh:332-347).

    ``sfa_blk`` is this k-step's [bm, nsub_a] slice and ``sfb_blk`` its
    [nsub_b, bn] slice, delivered pre-sliced by the BlockSpec index maps
    (exact f32 — no MXU round-trip). FP8 operands feed the MXU directly.
    Sub-block partials accumulate in registers; the caller does ONE
    ``acc_ref[:] +=`` so the f32 accumulator is touched once per k-step.
    """
    gka, gkb = spec.gran_k_a, spec.gran_k_b
    gsub = min(gka, gkb)
    total = None
    for s in range(bk // gsub):
        a_s = k_slice(a_blk, getattr(spec, 'a_kmajor', True), s * gsub, gsub)
        b_s = k_slice(b_blk, spec.b_kmajor, s * gsub, gsub)
        p = dot_mn(a_s, b_s, getattr(spec, 'a_kmajor', True), spec.b_kmajor)
        sa, sb = s * gsub // gka, s * gsub // gkb
        term = (p * sfb_blk[sb:sb + 1, :]) * sfa_blk[:, sa:sa + 1]
        total = term if total is None else total + term
    return total


def promote_block_swapped(spec, bk: int, k: int, a_blk, b_blk,
                          sfa_blk, sfb_blk):
    """Swap-AB variant of :func:`promote_block`: each sub-block dot is
    ``b_s @ a_s^T`` so the (usually taller) N/weight side is the MXU LHS —
    the TPU analog of the reference's mandatory swap-AB layouts for
    m-grouped GEMMs (/root/reference/csrc/jit_kernels/heuristics/sm100.hpp:31-43),
    where swapping puts the group-alignment constraint on a fixed dimension
    and frees the other MMA dimension.

    Returns the TRANSPOSED partial (bn, bm); the caller transposes once at
    the final k step. BITWISE-equal to promote_block elementwise: output
    element (j, i) is the same dot product with the same accumulation
    order, and the scale application keeps the original multiply order
    ``(p * sfb) * sfa`` per element.

    ``sfa_blk`` is this k-step's [nsub_a, bm] slice (k-first — note the
    TRANSPOSED required orientation vs promote_block) and ``sfb_blk`` its
    [bn, nsub_b] slice (dim-major), so both in-kernel scale selects stay
    static natural-orientation slices (row vector / column vector) with no
    lane<->sublane relayout.
    """
    gka, gkb = spec.gran_k_a, spec.gran_k_b
    gsub = min(gka, gkb)
    total = None
    for s in range(bk // gsub):
        a_s = k_slice(a_blk, getattr(spec, 'a_kmajor', True), s * gsub, gsub)
        b_s = k_slice(b_blk, spec.b_kmajor, s * gsub, gsub)
        p = dot_mn(b_s, a_s, spec.b_kmajor, getattr(spec, 'a_kmajor', True))
        sa, sb = s * gsub // gka, s * gsub // gkb
        term = (p * sfb_blk[:, sb:sb + 1]) * sfa_blk[sa:sa + 1, :]
        total = term if total is None else total + term
    return total


def ici_entry_barrier(axis_name: str, num_devices: int):
    """Cross-rank entry barrier before one-sided RDMA — the TPU analog of
    the reference's nvlink_barrier (/root/reference/deep_gemm/include/
    deep_gemm/comm/barrier.cuh:46-89): every rank signals every peer's
    barrier semaphore and waits for all peers' signals, so no push can land
    in a peer's kernel buffers before that peer has entered the kernel
    (buffer-liveness on real hardware, where XLA may still be reusing the
    target HBM). Mosaic also *requires* it: ``collective_id`` names the
    barrier semaphore's namespace and may only be set when the kernel uses
    one ("collective_id has to be unspecified or None when not using a
    custom barrier" — caught by the chipless AOT D=4 compile, which the CPU
    interpreter never surfaces). Call at the first grid step, before the
    first remote copy.
    """
    if num_devices <= 1:
        # no peers — and the barrier semaphore may only be touched when the
        # pallas_call carries a collective_id (callers pass None at D=1)
        return
    from jax.experimental.pallas import tpu as pltpu
    my = jax.lax.axis_index(axis_name)
    sem = pltpu.get_barrier_semaphore()
    for p in range(1, num_devices):
        peer = jax.lax.rem(my + p, num_devices)
        pltpu.semaphore_signal(sem, 1, device_id=peer,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(sem, num_devices - 1)
