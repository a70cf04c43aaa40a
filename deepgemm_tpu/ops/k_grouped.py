"""K-grouped GEMM public APIs (MoE weight gradients), mirroring
/root/reference/csrc/apis/gemm.hpp (k-grouped section) and the test usage
``k_grouped_fp8_gemm_tn_contiguous(a, b, d, ks_cpu, grouped_layout, c,
recipe=(1,1,gran_k), use_psum_layout=...)``
(/root/reference/tests/test_fp8_fp4.py:193-241).

TN layout: ``a`` [total_k, m], ``b`` [total_k, n] (MN-major); output
``[G, m, n]`` float32 with mandatory accumulation from ``c``.
"""

from typing import List, Optional

import jax.numpy as jnp

from ..kernels.k_grouped import k_grouped_gemm
from .gemm import _split_pair


def k_grouped_fp8_gemm_tn_contiguous(a, b, d=None, ks=None, grouped_layout=None,
                                     c=None, recipe=(1, 1, 128),
                                     compiled_dims='mn',
                                     use_psum_layout=False):
    """d[g] = c[g] + a_g^T @ b_g with per-channel (1 x gran_k) scaling on both
    operands, FP32 accumulate (wgrad contract,
    /root/reference/csrc/apis/gemm.hpp:328-390)."""
    del compiled_dims
    a_val, sfa = _split_pair(a)
    b_val, sfb = _split_pair(b)
    gran_k = recipe[2] if recipe is not None else 128
    # c=None means "accumulator is zero": the kernel zero-inits instead of
    # streaming G*m*n FP32 zeros from HBM (the d==c-alias fast path analog;
    # measured lever for the HBM-bound wgrad shape).
    if c is not None:
        num_groups = c.shape[0]
    else:
        num_groups = (len(ks) if ks is not None
                      else grouped_layout.shape[0])

    # `ks` (host list) is optional when a psum grouped_layout is given
    # (the "unsynced psum path", tests/test_fp8_fp4.py:213-226).
    if grouped_layout is None:
        assert ks is not None
        grouped_layout = jnp.asarray(ks, dtype=jnp.int32)

    sfa_t = sfa.astype(jnp.float32) if sfa is not None else None     # [nsf, m]
    sfb_t = sfb.astype(jnp.float32) if sfb is not None else None     # [nsf, n]
    if sfa_t is not None and ks is not None:
        # Loud shape gate: SFs are k-first, group-compacted [nsf_total, dim]
        # (tests/generators.py:411-433). A transposed SF slips through the
        # kernel's BlockSpecs and computes garbage silently.
        nsf_expect = sum((int(kg) + gran_k - 1) // gran_k for kg in ks)
        m_dim, n_dim = a_val.shape[1], b_val.shape[1]
        assert sfa_t.shape == (nsf_expect, m_dim), \
            f'sfa_t must be k-first [nsf_total={nsf_expect}, m={m_dim}], ' \
            f'got {sfa_t.shape}'
        assert sfb_t.shape == (nsf_expect, n_dim), \
            f'sfb_t must be k-first [nsf_total={nsf_expect}, n={n_dim}], ' \
            f'got {sfb_t.shape}'
    return k_grouped_gemm(a_val, b_val, c, grouped_layout,
                          use_psum_layout=use_psum_layout,
                          sfa_t=sfa_t, sfb_t=sfb_t, gran_k=gran_k,
                          num_groups=num_groups,
                          ks_cpu=ks if isinstance(ks, (list, tuple)) else None)


def k_grouped_fp8_gemm_nt_contiguous(a, b, d=None, ks: Optional[List[int]] = None,
                                     grouped_layout=None, c=None,
                                     recipe=(1, 1, 128), compiled_dims='mn',
                                     use_psum_layout=False):
    """SM90-style k-major variant: each group's A/B segment is stored K-major
    and flattened (/root/reference/tests/generators.py:462-473). Requires the
    host-side ``ks`` list to unflatten; segments are re-oriented logically
    (XLA fuses the transposes into the consuming kernel's reads)."""
    a_val, sfa = _split_pair(a)
    b_val, sfb = _split_pair(b)
    assert ks is not None, 'flattened k-major layout requires host-side ks'
    if c is not None:
        m, n = c.shape[1], c.shape[2]
    else:
        assert d is not None, 'pass c or a d shape template'
        m, n = d.shape[1], d.shape[2]

    def unflatten(x, dim):
        segs, off = [], 0
        for kg in ks:
            segs.append(x[off * dim:(off + kg) * dim].reshape(dim, kg).T)
            off += kg
        return jnp.concatenate(segs, axis=0)

    a2 = unflatten(a_val.reshape(-1), m)
    b2 = unflatten(b_val.reshape(-1), n)
    sfa2 = sfa.T if sfa is not None else None   # [m, nsf] -> [nsf, m]
    sfb2 = sfb.T if sfb is not None else None
    return k_grouped_fp8_gemm_tn_contiguous(
        (a2, sfa2), (b2, sfb2), d, ks, grouped_layout, c, recipe,
        use_psum_layout=use_psum_layout)


def k_grouped_bf16_gemm_tn_contiguous(a, b, d=None, ks=None, grouped_layout=None,
                                      c=None, compiled_dims='mn',
                                      use_psum_layout=False):
    if grouped_layout is None:
        assert ks is not None
        grouped_layout = jnp.asarray(ks, dtype=jnp.int32)
    num_groups = c.shape[0] if c is not None else \
        (len(ks) if ks is not None else grouped_layout.shape[0])
    return k_grouped_gemm(a, b, c, grouped_layout,
                          use_psum_layout=use_psum_layout,
                          num_groups=num_groups,
                          ks_cpu=ks if isinstance(ks, (list, tuple)) else None)
