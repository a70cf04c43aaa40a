"""Differentiable FP8 matmul tests: gradients vs the bf16 autodiff oracle
(straight-through quantization), mirroring how the reference's wgrad kernels
are validated against FP32 references (tests/test_fp8_fp4.py k-grouped)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepgemm_tpu.ops.autograd import fp8_matmul, fp8_dense
from deepgemm_tpu.testing import calc_diff


def test_fp8_matmul_forward():
    rng = np.random.RandomState(0)
    m, n, k = 64, 128, 256
    x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w = jnp.asarray(rng.randn(n, k) * 0.1, jnp.bfloat16)
    d = fp8_matmul(x, w)
    ref = np.asarray(x, np.float32) @ np.asarray(w, np.float32).T
    assert calc_diff(d, ref) < 1e-3


def test_fp8_matmul_grads():
    rng = np.random.RandomState(1)
    m, n, k = 64, 128, 256
    x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w = jnp.asarray(rng.randn(n, k) * 0.1, jnp.bfloat16)

    def loss_fp8(x_, w_):
        return jnp.sum(fp8_matmul(x_, w_).astype(jnp.float32) ** 2)

    def loss_ref(x_, w_):
        d = jnp.dot(x_.astype(jnp.float32), w_.astype(jnp.float32).T)
        return jnp.sum(d ** 2)

    gx, gw = jax.grad(loss_fp8, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    # FP8 quantization noise in fwd+bwd: a few 1e-3 in cosine diff
    assert calc_diff(gx, rx) < 5e-3, calc_diff(gx, rx)
    assert calc_diff(gw, rw) < 5e-3, calc_diff(gw, rw)
    assert gx.dtype == x.dtype and gw.dtype == w.dtype


def test_fp8_grouped_matmul_grads():
    """Grouped MoE matmul: fwd vs dense oracle; dx/dw vs bf16 autodiff."""
    from deepgemm_tpu.ops.autograd import fp8_grouped_matmul
    rng = np.random.RandomState(3)
    num_groups, rows, n, k = 2, 128, 128, 256   # rows per group = mk align
    m = num_groups * rows
    ids = jnp.repeat(jnp.arange(num_groups, dtype=jnp.int32), rows)
    x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w = jnp.asarray(rng.randn(num_groups, n, k) * 0.1, jnp.bfloat16)

    d = fp8_grouped_matmul(x, w, ids)
    ref = np.zeros((m, n), np.float32)
    for i in range(m):
        ref[i] = np.asarray(x, np.float32)[i] @ \
            np.asarray(w, np.float32)[int(ids[i])].T
    assert calc_diff(d, ref) < 1e-3

    def loss_fp8(x_, w_):
        return jnp.sum(fp8_grouped_matmul(x_, w_, ids).astype(jnp.float32) ** 2)

    def loss_ref(x_, w_):
        xf, wf = x_.astype(jnp.float32), w_.astype(jnp.float32)
        d_ = jnp.einsum('mk,mnk->mn', xf, wf[ids])
        return jnp.sum(d_ ** 2)

    gx, gw = jax.grad(loss_fp8, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    assert calc_diff(gx, rx) < 5e-3, calc_diff(gx, rx)
    assert calc_diff(gw, rw) < 5e-3, calc_diff(gw, rw)


def test_fp8_dense_training_step():
    """One SGD step through an fp8 dense layer decreases the loss."""
    rng = np.random.RandomState(2)
    b, s, k, n = 2, 16, 128, 128
    x = jnp.asarray(rng.randn(b, s, k), jnp.bfloat16)
    w = jnp.asarray(rng.randn(n, k) * 0.1, jnp.bfloat16)
    y = jnp.asarray(rng.randn(b, s, n), jnp.bfloat16)

    def loss(w_):
        return jnp.mean((fp8_dense(x, w_).astype(jnp.float32)
                         - y.astype(jnp.float32)) ** 2)

    l0 = float(loss(w))
    g = jax.grad(loss)(w)
    w1 = (w.astype(jnp.float32) - 0.05 * g.astype(jnp.float32)).astype(w.dtype)
    l1 = float(loss(w1))
    assert l1 < l0, (l0, l1)
