"""Flagship MoE transformer tests (models/transformer.py): forward sanity,
training-step loss decrease (XLA and FP8-training paths), and kernel-path
inference agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepgemm_tpu.models.transformer import (
    ModelConfig, init_params, forward, train_step)
from deepgemm_tpu.testing import calc_diff


def _cfg(**kw):
    base = dict(vocab=128, hidden=128, num_layers=1, num_heads=2, head_dim=64,
                num_experts=4, topk=2, moe_intermediate=128,
                capacity_factor=8.0)
    base.update(kw)
    return ModelConfig(**base)


def _data(cfg, batch=2, seq=16, seed=0):
    rng = np.random.RandomState(seed)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab, (batch, seq)), jnp.int32)
    targets = jnp.asarray(rng.randint(0, cfg.vocab, (batch, seq)), jnp.int32)
    return tokens, targets


def test_forward_shapes_finite():
    cfg = _cfg()
    params = init_params(cfg)
    tokens, _ = _data(cfg)
    logits = forward(params, tokens, cfg)
    assert logits.shape == (2, 16, cfg.vocab)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


@pytest.mark.parametrize('fp8_training', [False, True])
def test_train_step_decreases_loss(fp8_training):
    cfg = _cfg(use_fp8_training=fp8_training)
    params = init_params(cfg)
    tokens, targets = _data(cfg)
    l0, params = train_step(params, tokens, targets, cfg, lr=5e-2)
    l1, params = train_step(params, tokens, targets, cfg, lr=5e-2)
    l2, _ = train_step(params, tokens, targets, cfg, lr=5e-2)
    assert float(l2) < float(l0), (float(l0), float(l1), float(l2))


def test_kernel_vs_xla_inference():
    """use_kernels=True (Pallas MoE path) agrees with the XLA path."""
    cfg_k = _cfg(use_kernels=True)
    cfg_x = _cfg(use_kernels=False)
    params = init_params(cfg_k)
    tokens, _ = _data(cfg_k, seed=1)
    lk = forward(params, tokens, cfg_k)
    lx = forward(params, tokens, cfg_x)
    assert calc_diff(lk, lx) < 1e-5
