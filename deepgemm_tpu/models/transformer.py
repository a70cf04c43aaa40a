"""Flagship model: a DeepSeek-V3-style MoE decoder built on the deepgemm_tpu
kernel library.

The reference is a kernel library consumed by DeepSeek-class serving stacks
(README.md:3 of /root/reference); this module is the consuming model family:
RMSNorm -> attention -> RMSNorm -> expert-parallel SwiGLU MoE, with the FP8
block-scaled Pallas kernels on the inference path and a differentiable XLA
path for training. Sharding axes: dp (batch), tp (attention/dense hidden),
ep (experts).
"""

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.autograd import fp8_dense
from ..parallel.moe import MoEConfig, ep_moe_forward
from ..parallel.mega import mega_moe_forward
from ..ops.gemm import fp8_gemm_nt
from ..utils.math import per_token_cast_to_fp8, per_block_cast_to_fp8


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab: int = 32768
    hidden: int = 1024
    num_layers: int = 2
    num_heads: int = 8
    head_dim: int = 128
    num_experts: int = 8
    topk: int = 2
    moe_intermediate: int = 512
    capacity_factor: float = 4.0
    use_fp8: bool = False          # fp8 Pallas path (inference only)
    use_kernels: bool = False      # Pallas kernels vs differentiable XLA
    use_mega: bool = False         # overlapped mega-MoE pipeline (inference)
    mega_chunks: Optional[int] = None  # None = heuristics/mega.py policy
    mega_comm: str = 'xla'         # 'xla' | 'pallas' (RDMA a2a) | 'fused'
    # FP8 TRAINING: attention projections through the differentiable fp8
    # matmul (custom VJP: fp8 fwd/dgrad, FP32-accumulate wgrad); with
    # use_kernels also routes the MoE expert GEMMs through the grouped
    # autograd op (fp8 grouped fwd/dgrad + k-grouped FP32-accumulate wgrad)
    use_fp8_training: bool = False

    @property
    def qkv_dim(self):
        return self.num_heads * self.head_dim

    def moe_cfg(self) -> MoEConfig:
        return MoEConfig(num_experts=self.num_experts, hidden=self.hidden,
                         intermediate=self.moe_intermediate, topk=self.topk,
                         capacity_factor=self.capacity_factor,
                         use_fp8=self.use_fp8, use_kernels=self.use_kernels,
                         fp8_training=(self.use_fp8_training
                                       and self.use_kernels))


def init_params(cfg: ModelConfig, seed: int = 0) -> Dict[str, Any]:
    rng = np.random.RandomState(seed)

    def w(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return jnp.asarray(rng.randn(*shape) * scale, dtype=jnp.bfloat16)

    params = {
        'embed': w(cfg.vocab, cfg.hidden, scale=0.02),
        'final_norm': jnp.ones((cfg.hidden,), jnp.float32),
        'layers': [],
    }
    for _ in range(cfg.num_layers):
        params['layers'].append({
            'ln1': jnp.ones((cfg.hidden,), jnp.float32),
            'ln2': jnp.ones((cfg.hidden,), jnp.float32),
            'wqkv': w(3 * cfg.qkv_dim, cfg.hidden),
            'wo': w(cfg.hidden, cfg.qkv_dim),
            'router': jnp.asarray(rng.randn(cfg.num_experts, cfg.hidden) * 0.02,
                                  dtype=jnp.float32),
            'w1': w(cfg.num_experts, 2 * cfg.moe_intermediate, cfg.hidden),
            'w2': w(cfg.num_experts, cfg.hidden, cfg.moe_intermediate),
        })
    return params


def param_shardings(cfg: ModelConfig, mesh: Mesh) -> Dict[str, Any]:
    """NamedShardings: tp shards attention heads / hidden, ep shards experts."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    layer = {
        'ln1': ns(), 'ln2': ns(),
        'wqkv': ns('tp', None),      # heads sharded over tp
        'wo': ns(None, 'tp'),
        'router': ns(),
        'w1': ns('ep', None, None),  # experts sharded over ep
        'w2': ns('ep', None, None),
    }
    return {
        'embed': ns(),
        'final_norm': ns(),
        'layers': [dict(layer) for _ in range(cfg.num_layers)],
    }


def rms_norm(x, gamma, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * gamma).astype(x.dtype)


def attention(x, wqkv, wo, cfg: ModelConfig):
    b, s, h = x.shape
    if cfg.use_fp8_training:
        qkv = fp8_dense(x, wqkv)
    else:
        qkv = jnp.einsum('bsh,dh->bsd', x, wqkv,
                         preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_heads, cfg.head_dim)
    scores = jnp.einsum('bqnd,bknd->bnqk', q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(cfg.head_dim)
    causal = jnp.tril(jnp.ones((s, s), bool))
    scores = jnp.where(causal[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    ctx = jnp.einsum('bnqk,bknd->bqnd', probs, v,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    ctx = ctx.reshape(b, s, cfg.qkv_dim)
    if cfg.use_fp8_training:
        return fp8_dense(ctx, wo)
    return jnp.einsum('bsd,hd->bsh', ctx, wo,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def moe_block(x, layer, cfg: ModelConfig, mesh: Optional[Mesh]):
    """Router + EP MoE. With a mesh: shard_map over ('dp','ep') tokens and
    'ep' experts; without: single-device ep=1 path."""
    b, s, h = x.shape
    tokens = x.reshape(b * s, h)
    logits = tokens.astype(jnp.float32) @ layer['router'].T
    topk_w, topk_idx = jax.lax.top_k(logits, cfg.topk)
    topk_w = jax.nn.softmax(topk_w, axis=-1)
    moe_cfg = cfg.moe_cfg()

    def fwd(tok, idx, ww, w1, w2):
        w1_sf = w2_sf = None
        if moe_cfg.use_fp8 and moe_cfg.use_kernels \
                and not moe_cfg.fp8_training:
            # (fp8_training quantizes inside the autograd op instead —
            # weights must stay bf16 leaves so dw flows back to them)
            # FP8 serving path: per-expert 128x128-block weight quantization
            # feeding the scaled grouped kernels. (A serving stack would
            # pre-quantize once; doing it in-graph keeps this module pure.)
            w1, w1_sf = jax.vmap(
                functools.partial(per_block_cast_to_fp8, use_ue8m0=False))(w1)
            w2, w2_sf = jax.vmap(
                functools.partial(per_block_cast_to_fp8, use_ue8m0=False))(w2)
        if cfg.use_mega:
            y, _ = mega_moe_forward(tok, idx, ww, w1, w1_sf, w2, w2_sf,
                                    moe_cfg, num_chunks=cfg.mega_chunks,
                                    axis_name='ep', comm=cfg.mega_comm)
        else:
            y, _ = ep_moe_forward(tok, idx, ww, w1, w1_sf, w2, w2_sf, moe_cfg,
                                  axis_name='ep')
        return y

    if mesh is None:
        mesh1 = Mesh(np.asarray(jax.devices()[:1]), ('ep',))
        y = shard_map(fwd, mesh=mesh1,
                      in_specs=(P(), P(), P(), P('ep'), P('ep')),
                      out_specs=P(), check_vma=False)(
            tokens, topk_idx.astype(jnp.int32), topk_w,
            layer['w1'], layer['w2'])
    else:
        y = shard_map(fwd, mesh=mesh,
                      in_specs=(P(('dp', 'ep')), P(('dp', 'ep')), P(('dp', 'ep')),
                                P('ep'), P('ep')),
                      out_specs=P(('dp', 'ep')), check_vma=False)(
            tokens, topk_idx.astype(jnp.int32), topk_w,
            layer['w1'], layer['w2'])
    return y.reshape(b, s, h)


def forward(params, tokens, cfg: ModelConfig, mesh: Optional[Mesh] = None):
    """tokens [b, s] int32 -> logits [b, s, vocab] f32."""
    x = params['embed'][tokens]
    for layer in params['layers']:
        x = x + attention(rms_norm(x, layer['ln1']), layer['wqkv'],
                          layer['wo'], cfg)
        x = x + moe_block(rms_norm(x, layer['ln2']), layer, cfg, mesh)
    x = rms_norm(x, params['final_norm'])
    return jnp.einsum('bsh,vh->bsv', x, params['embed'],
                      preferred_element_type=jnp.float32)


def loss_fn(params, tokens, targets, cfg: ModelConfig, mesh=None):
    logits = forward(params, tokens, cfg, mesh)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def train_step(params, tokens, targets, cfg: ModelConfig, mesh=None,
               lr: float = 1e-3):
    """One SGD step (differentiable XLA MoE path)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg, mesh)
    new_params = jax.tree.map(
        lambda p, g: (p.astype(jnp.float32) - lr * g.astype(jnp.float32)).astype(p.dtype),
        params, grads)
    return loss, new_params
