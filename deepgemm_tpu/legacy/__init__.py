"""Legacy fallback tier — pure-XLA grouped GEMMs.

TPU analog of the reference's Triton A100 fallback kernels
(/root/reference/deep_gemm/legacy/): a Pallas-free tier that works on any
XLA backend (CPU debugging, older TPU gens, forward-compat) and is fully
differentiable. The m-grouped paths ride ``jax.lax.ragged_dot`` — XLA's
native MoE grouped-GEMM primitive — so they are NOT slow paths on TPU; the
fused k-grouped wgrad paths use a batched masked contraction (documented
B x cost blowup; the Pallas ``k_grouped_fp8_gemm_*`` kernels are the
production path).

Same call contracts as the reference (functional: ``d`` is returned; a
passed-in ``d`` is only a shape/dtype template):

  * ``m_grouped_bf16_gemm_{nt,nn}_contiguous_tl(a, b, d, m_indices)``
    (/root/reference/deep_gemm/legacy/m_grouped_gemm.py:63-90)
  * ``a_fused_m_grouped_bf16_gemm_{nt,nn}_contiguous_tl(a, b, d, m_indices,
    m_row_indices)`` — fused row-gather "expand" + grouped GEMM
    (/root/reference/deep_gemm/legacy/a_fused_m_grouped_gemm.py:64-95)
  * ``a_fused_k_grouped_bf16_gemm_tn_contiguous_tl(a, b, d, handle, acc)`` /
    ``b_fused_k_grouped_...`` — fused-operand k-grouped wgrad
    (/root/reference/deep_gemm/legacy/{a,b}_fused_k_grouped_gemm.py)
"""

import jax
import jax.numpy as jnp


def _group_sizes_from_ids(m_indices: jnp.ndarray, num_groups: int):
    """Contiguous per-row ids (-1 between-group padding) -> ragged_dot group
    sizes. Padding rows attach to the preceding group via a running max, and
    their outputs are zeroed by the caller (matching the Triton kernel's
    zero-fill for id < 0, m_grouped_gemm.py:36-41)."""
    ids = m_indices.astype(jnp.int32)
    carried = jax.lax.associative_scan(jnp.maximum, ids)
    carried = jnp.maximum(carried, 0)
    return jnp.bincount(carried, length=num_groups), ids


def m_grouped_bf16_gemm_nt_contiguous_tl(a, b, d=None, m_indices=None):
    """a [M, K] bf16, b [B, N, K] bf16, m_indices [M] int32 (-1 = padding)
    -> d [M, N] bf16."""
    num_groups = b.shape[0]
    sizes, ids = _group_sizes_from_ids(m_indices, num_groups)
    out = jax.lax.ragged_dot(a, jnp.swapaxes(b, 1, 2), sizes,
                             preferred_element_type=jnp.float32)
    out = jnp.where(ids[:, None] < 0, 0.0, out)
    return out.astype(jnp.bfloat16)


def m_grouped_bf16_gemm_nn_contiguous_tl(a, b, d=None, m_indices=None):
    """b is [B, K, N] (NN layout), m_grouped_gemm.py:85-90."""
    return m_grouped_bf16_gemm_nt_contiguous_tl(
        a, jnp.swapaxes(b, 1, 2), d, m_indices)


def a_fused_m_grouped_bf16_gemm_nt_contiguous_tl(a, b, d=None, m_indices=None,
                                                 m_row_indices=None):
    """Fused expand: gather rows of ``a`` by ``m_row_indices`` (< 0 -> zero
    row) then grouped GEMM (a_fused_m_grouped_gemm.py:44-57)."""
    rows = m_row_indices.astype(jnp.int32)
    a_g = jnp.where(rows[:, None] >= 0, a[rows.clip(0)], 0).astype(a.dtype)
    return m_grouped_bf16_gemm_nt_contiguous_tl(a_g, b, d, m_indices)


def a_fused_m_grouped_bf16_gemm_nn_contiguous_tl(a, b, d=None, m_indices=None,
                                                 m_row_indices=None):
    return a_fused_m_grouped_bf16_gemm_nt_contiguous_tl(
        a, jnp.swapaxes(b, 1, 2), d, m_indices, m_row_indices)


def _k_grouped_masked(a_km, b_kn, k_indices, k_start, k_end, acc, d,
                      gather_a: bool):
    """Shared fused k-grouped wgrad: for each group g, over k in
    [k_start[g], k_end[g]): d[g] (+)= gathered^T-style contraction. The
    gathered operand's rows come from ``k_indices`` (< 0 -> zero)."""
    k_total = b_kn.shape[0] if gather_a else a_km.shape[0]
    rows = k_indices.astype(jnp.int32)
    if gather_a:
        # a rows gathered by k_indices (a is [K_src, M]); b indexed directly
        a_eff = jnp.where(rows[:, None] >= 0, a_km[rows.clip(0)], 0)
        b_eff = b_kn
    else:
        a_eff = a_km
        b_eff = jnp.where(rows[:, None] >= 0, b_kn[rows.clip(0)], 0)
    karange = jnp.arange(k_total, dtype=jnp.int32)
    # [B, K] group masks; masked batched contraction (B x FLOPs fallback)
    mask = ((karange[None, :] >= k_start[:, None]) &
            (karange[None, :] < k_end[:, None]))
    a_masked = jnp.where(mask[:, :, None], a_eff[None], 0)
    out = jnp.einsum('bkm,kn->bmn', a_masked.astype(jnp.float32),
                     b_eff.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    if acc:
        out = out + d.astype(jnp.float32)
    else:
        # empty groups produce zero blocks (the Triton zero-fill path)
        out = jnp.where((k_start >= k_end)[:, None, None], 0.0, out)
    return out.astype(d.dtype if d is not None else jnp.float32)


def a_fused_k_grouped_bf16_gemm_tn_contiguous_tl(a, b, d, handle, acc: bool):
    """a [K_src, M] bf16 (rows gathered via k_indices), b [K, N] bf16,
    d [B, M, N]; handle = (k_indices [K], k_start [B], k_end [B])
    (a_fused_k_grouped_gemm.py:69-89)."""
    k_indices, k_start, k_end = handle
    return _k_grouped_masked(a, b, k_indices, k_start.astype(jnp.int32),
                             k_end.astype(jnp.int32), acc, d, gather_a=True)


def b_fused_k_grouped_bf16_gemm_tn_contiguous_tl(a, b, d, handle, acc: bool):
    """b rows gathered instead (b_fused_k_grouped_gemm.py:68-)."""
    k_indices, k_start, k_end = handle
    return _k_grouped_masked(a, b, k_indices, k_start.astype(jnp.int32),
                             k_end.astype(jnp.int32), acc, d, gather_a=False)
