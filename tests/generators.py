"""Shared test-case generators (TPU analog of /root/reference/tests/generators.py).

Inputs are generated in numpy (f32 -> bf16), the golden reference is computed
in f32 numpy, and quantization uses the library's own contract functions (which
test_math.py validates independently)."""

import numpy as np
import jax.numpy as jnp

from deepgemm_tpu import (
    align, ceil_div,
    per_token_cast_to_fp8, per_channel_cast_to_fp8, per_block_cast_to_fp8,
    per_token_cast_to_fp4,
    get_mk_alignment_for_contiguous_layout,
)


def rand_bf16(*shape, scale: float = 1.0):
    x = (np.random.randn(*shape) * scale).astype(np.float32)
    return jnp.asarray(x, dtype=jnp.bfloat16)


def f32(x) -> np.ndarray:
    return np.asarray(x).astype(np.float32)


def generate_normal(m, n, k, accumulate=False, out_dtype=jnp.bfloat16,
                    use_fp8=True, use_ue8m0=False,
                    gran_k_a=128, gran_k_b=128, b_pertoken=False):
    """Dense case: returns (a, b, c, ref_d) where a/b are bf16 or (fp8, sf)
    pairs in NT orientation (a [m,k], b [n,k]).

    Mirrors /root/reference/tests/generators.py:301-324.
    """
    a = rand_bf16(m, k)
    b = rand_bf16(n, k)
    c = (jnp.asarray(np.random.randn(m, n).astype(np.float32) * 32)
         .astype(out_dtype) if accumulate else None)
    ref_d = f32(a) @ f32(b).T
    if c is not None:
        ref_d = ref_d + f32(c)
    ref_d = np.asarray(jnp.asarray(ref_d).astype(out_dtype))

    if not use_fp8:
        return a, b, c, ref_d

    a_q = per_token_cast_to_fp8(a, use_ue8m0=use_ue8m0, gran_k=gran_k_a)
    if b_pertoken:
        b_q = per_token_cast_to_fp8(b, use_ue8m0=use_ue8m0, gran_k=gran_k_b)
    else:
        b_q = per_block_cast_to_fp8(b, use_ue8m0=use_ue8m0, gran_k=gran_k_b)
    return a_q, b_q, c, ref_d


def generate_m_grouped_contiguous(num_groups, expected_m_per_group, n, k,
                                  use_fp8=True, use_ue8m0=False,
                                  use_psum_layout=False, seed=0):
    """Contiguous grouped case (/root/reference/tests/generators.py:327-366):
    rows of each group padded to the mk alignment; grouped_layout is per-row
    group ids (-1 padding) or per-group psum end offsets."""
    rng = np.random.RandomState(seed)
    alignment = get_mk_alignment_for_contiguous_layout()
    actual_ms = [int(expected_m_per_group * rng.uniform(0.7, 1.3)) for _ in range(num_groups)]
    aligned_ms = [align(x, alignment) for x in actual_ms]
    m = sum(aligned_ms)

    a_np = rng.randn(m, k).astype(np.float32)
    b_np = rng.randn(num_groups, n, k).astype(np.float32)
    ref_d = np.empty((m, n), dtype=np.float32)
    if use_psum_layout:
        layout = np.empty((num_groups,), dtype=np.int32)
    else:
        layout = np.empty((m,), dtype=np.int32)

    start = 0
    for i, (actual_m, aligned_m) in enumerate(zip(actual_ms, aligned_ms)):
        actual_end, aligned_end = start + actual_m, start + aligned_m
        if use_psum_layout:
            layout[i] = actual_end
        else:
            layout[start:actual_end] = i
            layout[actual_end:aligned_end] = -1
        a_np[actual_end:aligned_end] = 0
        start = aligned_end

    a = jnp.asarray(a_np, dtype=jnp.bfloat16)
    b = jnp.asarray(b_np, dtype=jnp.bfloat16)
    start = 0
    for i, aligned_m in enumerate(aligned_ms):
        end = start + aligned_m
        ref_d[start:end] = f32(a[start:end]) @ f32(b[i]).T
        start = end
    ref_d = np.asarray(jnp.asarray(ref_d).astype(jnp.bfloat16))

    layout = jnp.asarray(layout)
    if not use_fp8:
        return m, a, b, layout, ref_d

    a_q = per_token_cast_to_fp8(a, use_ue8m0=use_ue8m0)
    b_vals, b_sfs = [], []
    for i in range(num_groups):
        v, s = per_block_cast_to_fp8(b[i], use_ue8m0=use_ue8m0)
        b_vals.append(v)
        b_sfs.append(s)
    b_q = (jnp.stack(b_vals), jnp.stack(b_sfs))
    return m, a_q, b_q, layout, ref_d


def generate_m_grouped_masked(num_groups, max_m, expected_m_per_group, n, k,
                              use_fp8=True, use_ue8m0=False, seed=0):
    """Masked (decode) case (/root/reference/tests/generators.py:380-408)."""
    rng = np.random.RandomState(seed)
    a = jnp.asarray(rng.randn(num_groups, max_m, k).astype(np.float32), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.randn(num_groups, n, k).astype(np.float32), dtype=jnp.bfloat16)
    masked_m = np.asarray([int(expected_m_per_group * rng.uniform(0.7, 1.3))
                           for _ in range(num_groups)], dtype=np.int32)
    assert masked_m.max() <= max_m
    ref_d = np.einsum('gmk,gnk->gmn', f32(a), f32(b))
    ref_d = np.asarray(jnp.asarray(ref_d).astype(jnp.bfloat16))

    if not use_fp8:
        return a, b, jnp.asarray(masked_m), ref_d

    a_vals, a_sfs, b_vals, b_sfs = [], [], [], []
    for g in range(num_groups):
        av, asf = per_token_cast_to_fp8(a[g], use_ue8m0=use_ue8m0)
        bv, bsf = per_block_cast_to_fp8(b[g], use_ue8m0=use_ue8m0)
        a_vals.append(av); a_sfs.append(asf)
        b_vals.append(bv); b_sfs.append(bsf)
    a_q = (jnp.stack(a_vals), jnp.stack(a_sfs))
    b_q = (jnp.stack(b_vals), jnp.stack(b_sfs))
    return a_q, b_q, jnp.asarray(masked_m), ref_d


def generate_k_grouped_contiguous(num_groups, m, n, ks, use_fp8=True,
                                  use_ue8m0=False, gran_k=128, seed=0):
    """K-grouped (wgrad) case (/root/reference/tests/generators.py:436-477):
    a [sum_k, m], b [sum_k, n] MN-major, c/d [g, m, n] f32 accumulation."""
    rng = np.random.RandomState(seed)
    k = sum(ks)
    a = jnp.asarray(rng.randn(k, m).astype(np.float32), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.randn(k, n).astype(np.float32), dtype=jnp.bfloat16)
    c = jnp.asarray(rng.randn(num_groups, m, n).astype(np.float32) * 32)

    ref_d = np.empty((num_groups, m, n), dtype=np.float32)
    start = 0
    for i, gk in enumerate(ks):
        end = start + gk
        ref_d[i] = f32(c[i]) + f32(a[start:end]).T @ f32(b[start:end])
        start = end

    ks_arr = jnp.asarray(np.asarray(ks, dtype=np.int32))
    if not use_fp8:
        return k, a, b, c, ref_d, ks_arr

    def cast_groups(x):
        vals = jnp.zeros(x.shape, dtype=jnp.float8_e4m3fn)
        sfs = []
        start = 0
        for gk in ks:
            end = start + gk
            if gk == 0:
                continue
            pad = align(gk, gran_k) - gk
            xg = jnp.pad(x[start:end], ((0, pad), (0, 0)))
            vg, sg = per_channel_cast_to_fp8(xg, use_ue8m0=use_ue8m0, gran_k=gran_k)
            vals = vals.at[start:end].set(vg[:gk])
            sfs.append(sg)
            start = end
        sf = jnp.concatenate(sfs) if sfs else jnp.zeros((0, x.shape[1]), jnp.float32)
        return vals, sf

    return k, cast_groups(a), cast_groups(b), c, ref_d, ks_arr
