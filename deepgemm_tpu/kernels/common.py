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


def onehot_cols(sf_blk, nsf: int, nsub: int, first):
    """Select `nsub` consecutive SF columns starting at dynamic index `first`
    from sf_blk [bm, nsf] -> (bm, nsub), via a one-hot matmul (Mosaic forbids
    dynamic lane-dim slicing unless 128-aligned). Out-of-range selections
    yield 0 — which implements k-tail masking for free."""
    sel = (jax.lax.broadcasted_iota(jnp.int32, (nsf, nsub), 0) ==
           first + jax.lax.broadcasted_iota(jnp.int32, (nsf, nsub), 1)
           ).astype(jnp.float32)
    return jnp.dot(sf_blk, sel, preferred_element_type=jnp.float32)


def onehot_rows(sf_blk, nsf: int, nsub: int, first):
    """Select `nsub` consecutive SF rows starting at dynamic index `first`
    from sf_blk [nsf, bn] -> (nsub, bn)."""
    sel = (jax.lax.broadcasted_iota(jnp.int32, (nsf, nsub), 0) ==
           first + jax.lax.broadcasted_iota(jnp.int32, (nsf, nsub), 1)
           ).astype(jnp.float32)
    return jax.lax.dot_general(
        sel, sf_blk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def mask_k_tail(blk, kmajor: bool, k_base, k_total: int):
    """Zero out-of-range k entries in a (padded) final k block."""
    ids = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1 if kmajor else 0)
    return jnp.where(k_base + ids < k_total, blk, jnp.zeros_like(blk))
