"""Driver benchmark over the BASELINE.json config families.

Emits one JSON line PER OP (configs 1-5: bf16 dense, fp8 dense+decode,
grouped contiguous, masked + k-grouped wgrad, MQA prefill + paged decode,
fused/unfused mega MoE, serving decode step), and re-emits the cumulative
headline line after EVERY leg so a timeout still leaves a parseable
headline as the final JSON line (the round-3 artifact was rc=124 with the
flagship legs never printed — never again):

  {"metric": "fp8_scaled_gemm_geomean_tflops", "value": N, "unit": "TFLOPS",
   "vs_baseline": N, "legs_done": K, "ops": {...per-op summary...}}

The headline metric stays the round-1 definition (geomean of dense fp8
4096^3 and the 128x4096x7168 decode shape vs the XLA bf16 dot) so rounds
stay comparable. Leg ORDER is certification priority, not config order:
dense headline first, then the flagship mega/serving legs, then the rest,
the zero-copy sweep last. Each leg is wall-budgeted (DGT_BENCH_BUDGET_S,
default 1620s): when the budget is gone remaining legs are skipped (logged
to stderr) and the bench exits 0 with the legs it has. Methodology: N
iterations inside one jitted fori_loop with rolled inputs, timed from
jax.profiler device-trace events (wall-clock through the axon relay is
unreliable); numerics asserted in-run against FP32 host oracles.
"""

import glob
import gzip
import json
import math
import os
import shutil
import socket
import sys
import time

_T0 = time.time()
BUDGET_S = float(os.environ.get('DGT_BENCH_BUDGET_S', '1620'))


def _fail_fast_if_relay_dead():
    """Under the axon tunnel, jax.devices() HANGS (not errors) when the local
    relay process is down — a dead relay would stall the driver's bench run
    forever. Probe the relay's remote-compile port with a TCP connect and
    emit an honest error line instead."""
    if os.environ.get('PALLAS_AXON_POOL_IPS') \
            and os.environ.get('JAX_PLATFORMS') == 'axon':
        try:
            socket.create_connection(('127.0.0.1', 8083), timeout=10).close()
        except OSError:
            print(json.dumps({
                'metric': 'fp8_scaled_gemm_geomean_tflops', 'value': 0.0,
                'unit': 'TFLOPS', 'vs_baseline': 0.0,
                'error': 'axon relay down (no listener on 127.0.0.1:8083); '
                         'TPU unreachable — bench aborted instead of hanging',
            }))
            sys.exit(1)


_fail_fast_if_relay_dead()

import numpy as np
import jax
import jax.numpy as jnp

N_ITERS = 16
BF16_PEAK = 188.0     # measured XLA bf16 dot TFLOPS on this v5e (roofline)
HBM_GBPS = 819.0


def _device_time_of(fn, args, tag) -> float:
    """Seconds per loop iteration, from a device trace (fallback: wall)."""
    trace_dir = f'/tmp/dgt_bench_{tag}'
    jax.block_until_ready(fn(*args))             # compile
    float(np.asarray(fn(*args)))                 # warm
    shutil.rmtree(trace_dir, ignore_errors=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        float(np.asarray(fn(*args)))
    wall = time.perf_counter() - t0
    best = 0.0
    try:
        paths = sorted(glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                                 recursive=True), key=os.path.getmtime)
        with gzip.open(paths[-1], 'rt') as f:
            trace = json.load(f)
        for ev in trace.get('traceEvents', []):
            if ev.get('ph') == 'X' and ev.get('name', '').startswith('jit_loop'):
                best = max(best, ev['dur'] / 1e6)
    except Exception:
        pass
    return (best or wall) / N_ITERS


# INPUT-REFRESH RULE (measured, scripts/measure_roll.py): every loop body
# must depend on ``i`` through a real operand so XLA cannot hoist the call
# out of the fori_loop — but jnp.roll of a LARGE operand materializes a copy
# the Pallas custom call cannot absorb (the XLA dot/einsum baselines fuse the
# same roll for free: dense 4096^3 kernel measured 176.2 roll-A vs 188.8
# roll-SF-only, while the XLA dot reads 187.9 either way). So kernel legs
# roll a SMALL side operand (the f32 scales / weights), and XLA-baseline legs
# keep rolling the big operand they fuse anyway. BF16 kernel legs (no SF)
# keep the big roll — their ragged_dot baseline pays the same copy.
def _loop(body_fn):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            return acc + body_fn(i, *args)
        return jax.lax.fori_loop(0, N_ITERS, body, 0.0)
    return loop


class _Bench:
    """Leg registry: runs legs in order under the wall budget, re-emitting
    the cumulative headline after each so the FINAL json line is always the
    headline (what the driver parses), complete or not."""

    def __init__(self):
        self.ops = {}
        self.tflops = []       # headline numerator legs (round-1 definition)
        self.speedups = []
        self.legs_done = 0
        self.skipped = []

    def emit_op(self, name, value, unit, vs_baseline):
        line = {'metric': name, 'value': value, 'unit': unit,
                'vs_baseline': vs_baseline}
        print(json.dumps(line), flush=True)
        self.ops[name] = line

    def emit_headline(self):
        geo_tf = geo_sp = 0.0
        if self.tflops:
            geo_tf = math.exp(sum(math.log(x) for x in self.tflops)
                              / len(self.tflops))
            geo_sp = math.exp(sum(math.log(x) for x in self.speedups)
                              / len(self.speedups))
        print(json.dumps({
            'metric': 'fp8_scaled_gemm_geomean_tflops',
            'value': round(geo_tf, 2),
            'unit': 'TFLOPS',
            'vs_baseline': round(geo_sp, 4),
            'legs_done': self.legs_done,
            'skipped': self.skipped,
            'ops': {k: {'value': v['value'], 'unit': v['unit'],
                        'vs_baseline': v['vs_baseline']}
                    for k, v in self.ops.items()},
        }), flush=True)

    def run(self, name, fn):
        left = BUDGET_S - (time.time() - _T0)
        if left < 30.0:
            self.skipped.append(name)
            print(f'[bench] SKIP {name}: {left:.0f}s left of budget',
                  file=sys.stderr, flush=True)
            return
        t0 = time.time()
        try:
            try:
                fn()
            except Exception as e:                    # noqa: BLE001
                # The axon relay intermittently rejects large compile
                # bodies (HTTP 413 / broken pipe) that succeed on a clean
                # retry (measured: the same loop_mega module 413'd in-bench
                # and compiled fine in isolation) — retry transient
                # transport errors once before giving the leg up.
                msg = str(e)
                transient = any(t in msg for t in
                                ('HTTP 413', 'Broken pipe', 'UNAVAILABLE',
                                 'Network Error'))
                if not transient or BUDGET_S - (time.time() - _T0) < 60:
                    raise
                print(f'[bench] leg {name} transient relay error, '
                      f'retrying once: {msg[:120]}', file=sys.stderr,
                      flush=True)
                fn()
            self.legs_done += 1
        except Exception as e:                        # noqa: BLE001
            self.skipped.append(name)
            print(f'[bench] LEG FAILED {name}: {type(e).__name__}: {e}',
                  file=sys.stderr, flush=True)
        print(f'[bench] leg {name}: {time.time() - t0:.1f}s '
              f'(total {time.time() - _T0:.1f}s)', file=sys.stderr,
              flush=True)
        self.emit_headline()


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import deepgemm_tpu as dg
    from deepgemm_tpu.testing import calc_diff
    from deepgemm_tpu.ops.m_grouped import _grouped_sfb_t
    from deepgemm_tpu.kernels.grouped import (
        m_grouped_gemm_contiguous, m_grouped_gemm_masked)
    # Cross-process compile cache: without it a fresh bench process redoes
    # every Mosaic compile through the (slow) remote relay.
    dg.init_persistent_cache()

    rng = np.random.RandomState(0)
    B = _Bench()

    # ---- configs 1+2: dense bf16 + dense/decode fp8 (headline) ----------
    def leg_dense():
        for si, (m, n, k) in enumerate([(4096, 4096, 4096),
                                        (128, 4096, 7168)]):
            a = jnp.asarray(rng.randn(m, k), dtype=jnp.bfloat16)
            b = jnp.asarray(rng.randn(n, k), dtype=jnp.bfloat16)
            aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
            bq, bsf = dg.per_block_cast_to_fp8(b, use_ue8m0=False)
            ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32).T
            d = dg.fp8_gemm_nt((aq, asf), (bq, bsf))
            assert calc_diff(d, ref) < 1e-3, (m, n, k)

            loop_ours = _loop(lambda i, av, sf, bv, bs2:
                              dg.fp8_gemm_nt((av, jnp.roll(sf, i, 0)),
                                             (bv, bs2))[0, 0]
                              .astype(jnp.float32))
            loop_xla = _loop(lambda i, a_, b_:
                             jnp.dot(jnp.roll(a_, i, 0), b_.T,
                                     preferred_element_type=jnp.float32
                                     ).astype(jnp.bfloat16)[0, 0]
                             .astype(jnp.float32))
            t_ours = _device_time_of(loop_ours, (aq, asf, bq, bsf),
                                     f'fp8_{si}')
            t_xla = _device_time_of(loop_xla, (a, b), f'bf16_{si}')
            tf = 2 * m * n * k / t_ours / 1e12
            B.tflops.append(tf)
            B.speedups.append(t_xla / t_ours)
            B.emit_op(f'fp8_dense_{m}x{n}x{k}', round(tf, 1), 'TFLOPS',
                      round(t_xla / t_ours, 3))
            if si == 1:
                B.emit_op('bf16_dense_128x4096x7168',
                          round(2 * m * n * k / t_xla / 1e12, 1), 'TFLOPS',
                          1.0)

    B.run('dense', leg_dense)

    # ---- config 5b: fused mega MoE (flagship — certify EARLY) -----------
    # The RDMA transfers need >1 chip; at D=1 the kernel still runs its full
    # dispatch-staging + L1 + SwiGLU/requant + L2 + combine structure with
    # local DMAs — the per-chip compute cadence of the serving pipeline.
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from deepgemm_tpu.kernels.fused_moe import fused_mega_moe

    def leg_mega():
        ELm, capm, Hm, Im = 8, 128, 7168, 2048
        xm = jnp.asarray(rng.randn(ELm * capm, Hm) * 0.5, jnp.bfloat16)
        xqm, xsfm = dg.per_token_cast_to_fp8(xm, use_ue8m0=False)
        xqm = xqm.reshape(1, ELm, capm, Hm)
        xsfm = xsfm.reshape(1, ELm, capm, -1)
        rwm = jnp.asarray(rng.rand(1, ELm, capm).astype(np.float32))
        w1m = jnp.asarray(rng.randn(ELm, 2 * Im, Hm) * 0.02, jnp.bfloat16)
        w2m = jnp.asarray(rng.randn(ELm, Hm, Im) * 0.02, jnp.bfloat16)
        w1mq, w1msf, w2mq, w2msf = [], [], [], []
        for e in range(ELm):
            vq, vs = dg.per_block_cast_to_fp8(w1m[e], use_ue8m0=False)
            w1mq.append(vq); w1msf.append(vs)
            vq, vs = dg.per_block_cast_to_fp8(w2m[e], use_ue8m0=False)
            w2mq.append(vq); w2msf.append(vs)
        w1mq, w1msf = jnp.stack(w1mq), jnp.stack(w1msf)
        w2mq, w2msf = jnp.stack(w2mq), jnp.stack(w2msf)
        mesh1 = Mesh(np.asarray(jax.devices()[:1]), ('ep',))
        # Load-time weight transform (pack_mega_weights): the tile-paired w1
        # repack runs ONCE here, not per forward call — measured 143 vs 61
        # TFLOPS at these dims when the repack sits inside the loop.
        packm = jax.block_until_ready(dg.pack_mega_weights(
            w1mq, w2mq, w1msf, w2msf, cap=capm, x_dtype=xqm.dtype,
            num_devices=1))
        mega_fn = jax.jit(shard_map(
            lambda xs, ss, rws, pw: fused_mega_moe(
                xs, rws, None, None, 'ep', send_sf=ss, packed=pw),
            mesh=mesh1, check_vma=False, in_specs=(P(),) * 4, out_specs=P()))

        @jax.jit
        def loop_mega(xs, ss, rws, pw):
            def body(i, acc):
                o = mega_fn(xs, jnp.roll(ss, i, 2), rws, pw)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITERS, body, 0.0)
        t_mega = _device_time_of(
            loop_mega, (xqm, xsfm, rwm, packm), 'mega')
        flops_mega = ELm * (2 * capm * 2 * Im * Hm + 2 * capm * Hm * Im)

        # Unfused A/B at identical dims — the reference's own fused-vs-legacy
        # speedup metric (its mega test prints "Nx legacy"): the SAME
        # pre-dispatched fp8 slabs through the unfused expert pipeline (masked
        # grouped L1 -> XLA SwiGLU/topk-weight/FP8-requant -> masked grouped
        # L2). Both legs use the Pallas kernels; the delta is the fusion
        # itself (no activation HBM round-trips, no separate requant pass,
        # one launch).
        from deepgemm_tpu.parallel.moe import swiglu_apply_weight_to_fp8
        sfb1m_t = _grouped_sfb_t(w1msf, ELm, 2 * Im, Hm, (128, 128),
                                 b_kmajor=True)
        sfb2m_t = _grouped_sfb_t(w2msf, ELm, Hm, Im, (128, 128),
                                 b_kmajor=True)
        fullm = jnp.full((ELm,), capm, jnp.int32)

        # Big arrays (weights/SFs) MUST be jit ARGUMENTS, never closures:
        # jax embeds closed-over device arrays into the StableHLO as
        # literals, and the relay rejects the resulting ~350MB compile
        # body (HTTP 413) — the round-4 bench-timeout root cause.
        def _unfused_mega(xq, sf, rws, w1q, sfb1_t, w2q, sfb2_t):
            gu = m_grouped_gemm_masked(xq, w1q, fullm, sfa=sf,
                                       sfb_t=sfb1_t,
                                       out_dtype=jnp.bfloat16,
                                       expected_m=capm)
            aq2, asf2 = swiglu_apply_weight_to_fp8(gu, rws)
            return m_grouped_gemm_masked(aq2, w2q, fullm, sfa=asf2,
                                         sfb_t=sfb2_t,
                                         out_dtype=jnp.bfloat16,
                                         expected_m=capm)

        # one-time fairness guard: both legs compute the same MoE (up to the
        # in-kernel vs host fp8 requant of the activations); diff ON DEVICE —
        # never pull the big arrays through the relay
        y_f = mega_fn(xqm, xsfm, rwm, packm)
        y_u = jax.jit(_unfused_mega)(xqm[0], xsfm[0], rwm[0],
                                     w1mq, sfb1m_t, w2mq, sfb2m_t)

        @jax.jit
        def _dev_diff(x, y):
            x, y = x.astype(jnp.float32), y.astype(jnp.float32)
            return 1.0 - 2.0 * jnp.vdot(x, y) / (jnp.vdot(x, x)
                                                 + jnp.vdot(y, y))
        dmega = float(_dev_diff(y_f[0], y_u))
        assert dmega < 1e-3, dmega
        del y_f, y_u

        @jax.jit
        def loop_unf(xs, ss, rws, w1q, sfb1_t, w2q, sfb2_t):
            def body(i, acc):
                y = _unfused_mega(xs[0], jnp.roll(ss, i, 2)[0], rws[0],
                                  w1q, sfb1_t, w2q, sfb2_t)
                return acc + y[0, 0, i].astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITERS, body, 0.0)
        t_unf = _device_time_of(
            loop_unf, (xqm, xsfm, rwm, w1mq, sfb1m_t, w2mq, sfb2m_t),
            'mega_unfused')
        tf_unf = flops_mega / t_unf / 1e12
        B.emit_op('fp8_unfused_mega_moe_1chip', round(tf_unf, 1), 'TFLOPS',
                  round(tf_unf / BF16_PEAK, 3))
        B.emit_op('fp8_fused_mega_moe_1chip',
                  round(flops_mega / t_mega / 1e12, 1), 'TFLOPS',
                  round(t_unf / t_mega, 3))

        # XLA "legacy" speedup line — the reference's mega test prints
        # fused-vs-legacy speedups (tests/test_mega_moe.py:233-267); ours
        # compares against the STRONGEST no-kernel JAX chain at identical
        # dims (dequantized bf16 einsums + SwiGLU, zero Pallas).
        def _xla_legacy(xq, sf, rws, w1b, w2b):
            x = (xq[0].astype(jnp.float32)
                 * jnp.repeat(sf[0].astype(jnp.float32), 128,
                              axis=2)[..., :Hm]).astype(jnp.bfloat16)
            gu = jnp.einsum('ech,eih->eci', x, w1b,
                            preferred_element_type=jnp.float32)
            g, u = gu[..., :Im], gu[..., Im:]
            act = (jax.nn.silu(g) * u
                   * rwm[0][..., None]).astype(jnp.bfloat16)
            return jnp.einsum('eci,ehi->ech', act, w2b,
                              preferred_element_type=jnp.float32)

        @jax.jit
        def loop_leg(xs, ss, rws, w1b, w2b):
            def body(i, acc):
                y = _xla_legacy(xs, jnp.roll(ss, i, 2), rws, w1b, w2b)
                return acc + y[0, 0, i].astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITERS, body, 0.0)
        t_leg = _device_time_of(loop_leg, (xqm, xsfm, rwm, w1m, w2m),
                                'mega_xla_legacy')
        B.emit_op('fp8_fused_mega_vs_xla_legacy',
                  round(flops_mega / t_mega / 1e12, 1), 'TFLOPS',
                  round(t_leg / t_mega, 3))

        # FP8xFP4 fused mega (reference flagship MmaKind::MXFP8FP4): packed
        # e2m1 weights, in-VPU nibble decode, bitwise vs pre-decoded fp8 —
        # MEASURED 0.26x on v5e (VPU decode-bound; the kernel is MXU-bound
        # at cap=128, so halving the weight stream buys nothing). The leg
        # keeps the ratio driver-visible; v5e default stays pre-decode.
        from deepgemm_tpu.utils.math import (_quantize_to_fp4_e2m1,
                                             pack_fp4_planar)

        @jax.jit
        def _quant_fp4(w):
            e, nn_, kk_ = w.shape
            wf = w.astype(jnp.float32).reshape(e, nn_ // 128, 128,
                                               kk_ // 128, 128)
            amax = jnp.clip(jnp.abs(wf).max(axis=(2, 4)), 1e-4, None)
            sfw = amax / 6.0
            scaled = (wf / sfw[:, :, None, :, None]).reshape(e, nn_, kk_)
            return pack_fp4_planar(
                _quantize_to_fp4_e2m1(scaled).astype(jnp.int32)), sfw
        w1p4, w1sf4 = _quant_fp4(w1m)
        w2p4, w2sf4 = _quant_fp4(w2m)
        pack4 = jax.block_until_ready(dg.pack_mega_weights(
            w1p4, w2p4, w1sf4, w2sf4, cap=capm, x_dtype=xqm.dtype,
            num_devices=1, w_packed_fp4=True))
        mega4_fn = jax.jit(shard_map(
            lambda xs, ss, rws, pw: fused_mega_moe(
                xs, rws, None, None, 'ep', send_sf=ss, packed=pw),
            mesh=mesh1, check_vma=False, in_specs=(P(),) * 4, out_specs=P()))

        @jax.jit
        def loop_mega4(xs, ss, rws, pw):
            def body(i, acc):
                o = mega4_fn(xs, jnp.roll(ss, i, 2), rws, pw)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITERS, body, 0.0)
        t_m4 = _device_time_of(loop_mega4, (xqm, xsfm, rwm, pack4),
                               'mega_fp4')
        B.emit_op('fp8xfp4_fused_mega_moe_1chip',
                  round(flops_mega / t_m4 / 1e12, 1), 'TFLOPS',
                  round(t_mega / t_m4, 3))

    B.run('mega', leg_mega)

    # ---- config 6: end-to-end serving decode step (tokens/s) ------------
    # One continuous-batching decode step for ALL slots in the engine's r5
    # SPLIT cadence: a DONATED cache scatter-append jit (in-place, 27 us
    # measured vs 3368 undonated — scripts/measure_serving_donate.py) plus
    # a read-only compute jit (Pallas paged indexer scoring + top-k + XLA
    # token gather + FUSED Pallas sparse attention). The two must stay
    # separate dispatches: composed, XLA re-materializes a full cache copy
    # even under donation. Baseline: the same donated append + the compute
    # step a no-kernel JAX server would run (XLA scoring einsum + XLA
    # attention tail). tokens/s = slots / (append + compute) device time.
    def leg_serving():
        from deepgemm_tpu.models.indexer import indexer_sparse_decode, \
            _topk_indices
        Bs, bkv_s, mps = 64, 64, 64
        nbs = Bs * mps
        hs, ds, his, dis, tks = 8, 128, 32, 128, 512
        mcl = bkv_s * mps                                  # ctx 4096
        kp_s = jnp.asarray(rng.randn(nbs, bkv_s, hs, ds) * 0.1, jnp.bfloat16)
        vp_s = jnp.asarray(rng.randn(nbs, bkv_s, hs, ds) * 0.1, jnp.bfloat16)
        ikp_s = jnp.clip(jnp.asarray(rng.randn(nbs, bkv_s, dis), jnp.float32),
                         -448, 448).astype(jnp.float8_e4m3fn)
        isfp_s = jnp.asarray(rng.rand(nbs, bkv_s).astype(np.float32))
        btab_s = jnp.asarray(rng.permutation(nbs).reshape(Bs, mps), jnp.int32)
        last = mcl - 1
        pages_s = btab_s[jnp.arange(Bs), last // bkv_s]
        offs_s = jnp.full((Bs,), last % bkv_s, jnp.int32)
        ctx_s = jnp.full((Bs,), mcl, jnp.int32)            # after the append
        q_s = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
        iq_s = jnp.asarray(rng.randn(Bs, his, dis) * 0.1, jnp.bfloat16)
        iw_s = jnp.asarray(rng.randn(Bs, his).astype(np.float32))
        kn_s = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
        vn_s = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
        ikn_s = jnp.clip(jnp.asarray(rng.randn(Bs, dis), jnp.float32),
                         -448, 448).astype(jnp.float8_e4m3fn)
        isn_s = jnp.asarray(rng.rand(Bs).astype(np.float32))

        # Cache pages ride as jit ARGUMENTS (kp/vp are ~537MB each): closed
        # over, they'd be embedded in the compile body -> relay HTTP 413 /
        # broken pipe (the round-4 serving-leg failure root cause).
        def serve_append(kp, vp, ikp, isf):
            kp2 = kp.at[pages_s, offs_s].set(kn_s)
            vp2 = vp.at[pages_s, offs_s].set(vn_s)
            ik2 = ikp.at[pages_s, offs_s].set(ikn_s)
            is2 = isf.at[pages_s, offs_s].set(isn_s)
            return kp2, vp2, ik2, is2
        serve_append = jax.jit(serve_append, donate_argnums=(0, 1, 2, 3))

        @jax.jit
        def serve_kernel(kp, vp, ikp, isf, iw):
            out = indexer_sparse_decode(
                q_s[:, None], (kp, vp), (ikp, isf), iq_s[:, None], iw,
                ctx_s, btab_s, mcl, tks)
            return out.astype(jnp.float32)[0, 0, 0, 0]

        @jax.jit
        def serve_xla(kp, vp, ikp, isf, iw):
            # plain-JAX scoring: gather index cache linear, relu einsum;
            # then the XLA attention tail over the gathered rows
            ik_lin = ikp[btab_s].reshape(Bs, mcl, dis).astype(jnp.float32)
            is_lin = isf[btab_s].reshape(Bs, mcl)
            sc = jnp.maximum(
                jnp.einsum('bhd,btd->bht', iq_s.astype(jnp.float32),
                           ik_lin), 0.0) * is_lin[:, None]
            logits = jnp.einsum('bht,bh->bt', sc, iw)
            col = jnp.arange(mcl, dtype=jnp.int32)[None]
            logits = jnp.where(col < ctx_s[:, None], logits, -jnp.inf)
            sel, valid = _topk_indices(logits, tks)
            pg = jnp.clip(sel, 0, mcl - 1) // bkv_s
            of = jnp.clip(sel, 0, mcl - 1) % bkv_s
            rows = jnp.arange(Bs)[:, None]
            blocks = btab_s[rows, jnp.clip(pg, 0, mps - 1)]
            k_sel = kp[blocks, of]
            v_sel = vp[blocks, of]
            scr = jnp.einsum('bhd,bthd->bht', q_s.astype(jnp.float32),
                             k_sel.astype(jnp.float32)) / np.sqrt(ds)
            scr = jnp.where(valid[:, None, :], scr, -jnp.inf)
            pr = jax.nn.softmax(scr, axis=-1)
            out = jnp.einsum('bht,bthd->bhd', pr, v_sel.astype(jnp.float32))
            return out[0, 0, 0]

        def time_cycle(compute_fn, tag):
            """Seconds per decode step in the SPLIT cadence: median device
            time of the donated append jit + the compute jit (per-call
            trace events; a fori_loop cannot express donation — loop-carried
            caches copy twice, scripts/measure_serving_donate.py)."""
            st = tuple(jax.block_until_ready(jnp.copy(x))
                       for x in (kp_s, vp_s, ikp_s, isfp_s))
            for _ in range(2):                       # compile + warm
                st = tuple(serve_append(*st))
                r = compute_fn(*st, iw_s)
            trace_dir = f'/tmp/dgt_bench_serve_{tag}'
            shutil.rmtree(trace_dir, ignore_errors=True)
            with jax.profiler.trace(trace_dir):
                for _ in range(12):
                    st = tuple(serve_append(*st))
                    r = compute_fn(*st, iw_s)
                jax.block_until_ready(r)
            durs = {}
            paths = sorted(glob.glob(
                os.path.join(trace_dir, '**', '*.trace.json.gz'),
                recursive=True), key=os.path.getmtime)
            with gzip.open(paths[-1], 'rt') as f:
                tr = json.load(f)
            for ev in tr.get('traceEvents', []):
                if ev.get('ph') == 'X' and \
                        ev.get('name', '').startswith('jit_serve'):
                    durs.setdefault(ev['name'], []).append(ev['dur'])
            total = 0.0
            for name, ds_ in durs.items():
                ds_.sort()
                total += ds_[len(ds_) // 2]
            assert total > 0.0, 'no jit_serve_* trace events'
            return total / 1e6

        # Kernel path FIRST and emitted even if the (very slow to compile)
        # plain-JAX baseline leg dies — a flagship tokens/s number with
        # vs_baseline=0.0 beats losing the whole leg to a relay hiccup.
        t_sv = time_cycle(serve_kernel, 'kernel')
        try:
            t_sx = time_cycle(serve_xla, 'xla')
            ratio = round(t_sx / t_sv, 3)
        except Exception as e:                        # noqa: BLE001
            print(f'[bench] serving XLA baseline failed: {e}',
                  file=sys.stderr, flush=True)
            ratio = 0.0
        B.emit_op('serving_decode_tokens_per_s', round(Bs / t_sv, 1),
                  'tokens/s', ratio)

    B.run('serving', leg_serving)

    # ---- config 3: m-grouped fp8 contiguous (MoE prefill) ---------------
    G, mpg, n, k = 8, 1024, 4096, 7168
    st = {}

    def leg_grouped():
        m = G * mpg
        a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
        bg = jnp.asarray(rng.randn(G, n, k) * 0.1, jnp.bfloat16)
        bs = [dg.per_block_cast_to_fp8(bg[g], use_ue8m0=False)
              for g in range(G)]
        bq = jnp.stack([x[0] for x in bs])
        bsf = jnp.stack([x[1] for x in bs])
        sfb_t = _grouped_sfb_t(bsf, G, n, k, (128, 128), b_kmajor=True)
        st.update(bq=bq, sfb_t=sfb_t)
        ids = jnp.repeat(jnp.arange(G, dtype=jnp.int32), mpg)
        loop_g = _loop(lambda i, aq_, asf_, bq_, sfb_:
                       m_grouped_gemm_contiguous(
                           aq_, bq_, ids, use_psum_layout=False,
                           sfa=jnp.roll(asf_, i, 0), sfb_t=sfb_,
                           out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32))
        b_kn = jnp.swapaxes(bg, 1, 2)
        sizes = jnp.full((G,), mpg, jnp.int32)
        loop_rd = _loop(lambda i, a_, b_:
                        jax.lax.ragged_dot(jnp.roll(a_, i, 0), b_, sizes,
                                           preferred_element_type=jnp.float32
                                           )[0, 0].astype(jnp.float32))
        t_g = _device_time_of(loop_g, (aq, asf, bq, sfb_t), 'grouped')
        t_rd = _device_time_of(loop_rd, (a, b_kn), 'ragged')
        st['tf_g256'] = 2 * m * n * k / t_g / 1e12
        B.emit_op('fp8_grouped_contiguous_G8', round(st['tf_g256'], 1),
                  'TFLOPS', round(t_rd / t_g, 3))

        # BF16 grouped through the same Pallas kernel (default routing since
        # the r3 A/B: 160.8 vs ragged_dot 144.9); baseline = the ragged_dot
        # loop above, which is exactly what DGT_BF16_GROUPED=ragged would run.
        loop_gbf = _loop(lambda i, a_, b_:
                         m_grouped_gemm_contiguous(
                             jnp.roll(a_, i, 0), b_, ids,
                             use_psum_layout=False,
                             out_dtype=jnp.bfloat16)[0, 0]
                         .astype(jnp.float32))
        t_gbf = _device_time_of(loop_gbf, (a, bg), 'grouped_bf16')
        B.emit_op('bf16_grouped_contiguous_G8',
                  round(2 * m * n * k / t_gbf / 1e12, 1), 'TFLOPS',
                  round(t_rd / t_gbf, 3))

    B.run('grouped', leg_grouped)

    def leg_grouped128():
        # alignment-128 layout: group starts with gcd 128, so the adaptive
        # block_m lift CANNOT raise bm past 128 — the scalar-prefetch-gap
        # case. Driver-visible so regressions here are caught (VERDICT r2
        # weak #5). Uneven 128-multiples: 896/1152 alternate.
        if not {'bq', 'sfb_t', 'tf_g256'} <= st.keys():
            # dependency, not a failure: the grouped leg was budget-skipped
            # or failed, so its B operands/reference rate never materialized
            print('[bench] SKIP grouped_align128: grouped leg unavailable')
            return
        mpg_list = [896 if g % 2 == 0 else 1152 for g in range(G)]
        m128 = sum(mpg_list)
        ids128 = jnp.asarray(np.repeat(np.arange(G, dtype=np.int32),
                                       mpg_list))
        a128 = jnp.asarray(rng.randn(m128, k), jnp.bfloat16)
        aq128, asf128 = dg.per_token_cast_to_fp8(a128, use_ue8m0=False)
        loop_g128 = _loop(lambda i, aq_, asf_, bq_, sfb_:
                          m_grouped_gemm_contiguous(
                              aq_, bq_, ids128,
                              use_psum_layout=False,
                              sfa=jnp.roll(asf_, i, 0), sfb_t=sfb_,
                              out_dtype=jnp.bfloat16)[0, 0]
                          .astype(jnp.float32))
        t_g128 = _device_time_of(loop_g128,
                                 (aq128, asf128, st['bq'], st['sfb_t']),
                                 'grouped128')
        tf128 = 2 * m128 * n * k / t_g128 / 1e12
        B.emit_op('fp8_grouped_contig_align128', round(tf128, 1), 'TFLOPS',
                  round(tf128 / st['tf_g256'], 3))

    B.run('grouped_align128', leg_grouped128)

    # ---- config 4: masked decode + k-grouped wgrad ----------------------
    def leg_masked():
        Gm, max_m, nm, km = 8, 256, 4096, 7168
        am = jnp.asarray(rng.randn(Gm, max_m, km), jnp.bfloat16)
        amq, amsf = dg.per_token_cast_to_fp8(am.reshape(-1, km),
                                             use_ue8m0=False)
        amq = amq.reshape(Gm, max_m, km)
        amsf = amsf.reshape(Gm, max_m, -1)
        bmg = jnp.asarray(rng.randn(Gm, nm, km) * 0.1, jnp.bfloat16)
        bsm = [dg.per_block_cast_to_fp8(bmg[g], use_ue8m0=False)
               for g in range(Gm)]
        bmq = jnp.stack([x[0] for x in bsm])
        bmsf = jnp.stack([x[1] for x in bsm])
        sfbm_t = _grouped_sfb_t(bmsf, Gm, nm, km, (128, 128), b_kmajor=True)
        masked = jnp.full((Gm,), max_m, jnp.int32)
        loop_m = _loop(lambda i, aq_, sf_, bq_, sfb_:
                       m_grouped_gemm_masked(
                           aq_, bq_, masked, sfa=jnp.roll(sf_, i, 1),
                           sfb_t=sfb_, out_dtype=jnp.bfloat16,
                           expected_m=max_m)[0, 0, 0].astype(jnp.float32))
        loop_me = _loop(lambda i, a_, b_:
                        jnp.einsum('gmk,gnk->gmn', jnp.roll(a_, i, 1), b_,
                                   preferred_element_type=jnp.float32
                                   # [0, 0, i]: DCE-proof dynamic consumption
                                   # (see the wgrad note below)
                                   ).astype(jnp.bfloat16)[0, 0, i]
                        .astype(jnp.float32))
        t_m = _device_time_of(loop_m, (amq, amsf, bmq, sfbm_t), 'masked')
        t_me = _device_time_of(loop_me, (am, bmg), 'masked_xla')
        flops_m = 2 * Gm * max_m * nm * km
        B.emit_op('fp8_grouped_masked_G8', round(flops_m / t_m / 1e12, 1),
                  'TFLOPS', round(t_me / t_m, 3))

        # Skewed/low-occupancy decode regime (the reference's 0.7-1.3x
        # expected_m sweeps, tests/generators.py:211-226): masked counts
        # ~0.25 * max_m per group, so the full-occupancy reroute does NOT
        # fire — this measures the predicated masked kernel itself.
        # Effective TFLOPS counts only the VALID rows' flops (the masked
        # kernel's whole point is not paying for the padding); baseline is
        # the XLA einsum over the full padded batch (what a no-kernel
        # implementation must compute at unknown-occupancy decode).
        mlow = max_m // 4
        masked_lo = jnp.full((Gm,), mlow, jnp.int32)
        loop_mlo = _loop(lambda i, aq_, sf_, bq_, sfb_:
                         m_grouped_gemm_masked(
                             aq_, bq_, masked_lo, sfa=jnp.roll(sf_, i, 1),
                             sfb_t=sfb_, out_dtype=jnp.bfloat16,
                             expected_m=mlow)[0, 0, 0].astype(jnp.float32))
        t_mlo = _device_time_of(loop_mlo, (amq, amsf, bmq, sfbm_t),
                                'masked_skewed')
        flops_lo = 2 * Gm * mlow * nm * km
        B.emit_op('fp8_grouped_masked_skewed_G8',
                  round(flops_lo / t_mlo / 1e12, 1), 'TFLOPS',
                  round(t_me / t_mlo, 3))

    B.run('masked', leg_masked)

    def leg_wgrad():
        # wgrad: k-grouped TN, G4 equal groups of 2048 over total_k 8192
        Gk, mk_, nk_, kpg = 4, 4096, 7168, 2048
        tk = Gk * kpg
        ak = jnp.asarray(rng.randn(tk, mk_) * 0.1, jnp.bfloat16)
        bk_ = jnp.asarray(rng.randn(tk, nk_) * 0.1, jnp.bfloat16)
        akq, aksf = dg.per_channel_cast_to_fp8(ak, use_ue8m0=False)
        bkq, bksf = dg.per_channel_cast_to_fp8(bk_, use_ue8m0=False)
        ks_list = [kpg] * Gk
        from deepgemm_tpu.kernels.k_grouped import k_grouped_gemm
        # c=None: the accumulator is known-zero, so the kernel skips
        # streaming G*m*n FP32 of zeros (the d==c-alias analog; frees VMEM
        # for wider tiles). Consumption MUST be a dynamic index on the LAST
        # dim, never ``reshape(-1)[i]``: a dynamic index through a 3D->1D
        # reshape makes XLA physically relayout the 470MB f32 output EVERY
        # iteration (+1.4ms/iter on BOTH legs — measured 108.5 "TFLOPS" vs
        # the kernel's real 161.5), while a static [0,0,0] lets XLA DCE this
        # einsum into a sliver. [0, 0, i] is DCE-proof and relayout-free.
        loop_k = _loop(lambda i, a_, b_, sa, sb:
                       k_grouped_gemm(a_, b_, None,
                                      jnp.asarray(ks_list, jnp.int32),
                                      use_psum_layout=False,
                                      sfa_t=jnp.roll(sa, i, 1), sfb_t=sb,
                                      ks_cpu=ks_list)[0, 0, i])
        loop_ke = _loop(lambda i, a_, b_:
                        jnp.einsum('gkm,gkn->gmn',
                                   jnp.roll(a_, i, 1).reshape(Gk, kpg, mk_),
                                   b_.reshape(Gk, kpg, nk_),
                                   preferred_element_type=jnp.float32
                                   )[0, 0, i])
        t_k = _device_time_of(loop_k, (akq, bkq, aksf, bksf), 'wgrad')
        t_ke = _device_time_of(loop_ke, (ak, bk_), 'wgrad_xla')
        flops_k = 2 * mk_ * nk_ * tk
        B.emit_op('fp8_k_grouped_wgrad_G4', round(flops_k / t_k / 1e12, 1),
                  'TFLOPS', round(t_ke / t_k, 3))

    B.run('wgrad', leg_wgrad)

    # ---- config 5: MQA prefill + paged decode ---------------------------
    def leg_mqa():
        sq, skv, h, dh = 2048, 8192, 64, 128
        qm = jnp.asarray(rng.randn(sq, h, dh), jnp.bfloat16)
        kvm = jnp.asarray(rng.randn(skv, dh), jnp.bfloat16)
        wm = jnp.asarray(rng.randn(sq, h).astype(np.float32))
        ksr = jnp.zeros((sq,), jnp.int32)
        ker = jnp.asarray(np.arange(sq, dtype=np.int32) + (skv - sq))
        q8 = jnp.clip(qm.astype(jnp.float32), -448,
                      448).astype(jnp.float8_e4m3fn)
        kv8, kvsf = dg.per_custom_dims_cast_to_fp8(kvm, (0,),
                                                   use_ue8m0=False)
        loop_mqa = _loop(lambda i, q_, kv_, w_:
                         dg.fp8_mqa_logits((q_, None), (kv_, kvsf),
                                           jnp.roll(w_, i, 0), ksr,
                                           ker)[0, 0].astype(jnp.float32))
        t_mqa = _device_time_of(loop_mqa, (q8, kv8, wm), 'mqa')
        flops_mqa = 2 * sq * h * dh * skv
        tf_mqa = flops_mqa / t_mqa / 1e12
        B.emit_op('fp8_mqa_logits_prefill', round(tf_mqa, 1), 'TFLOPS',
                  round(tf_mqa / BF16_PEAK, 3))

    B.run('mqa', leg_mqa)

    def leg_paged():
        Bp, nn2, h2, d2 = 64, 1, 32, 128
        bkv, bps = 64, 64
        mml = bkv * bps                                   # ctx 4096
        nb = Bp * bps
        kvv = jnp.asarray(rng.randn(nb, bkv, d2), jnp.bfloat16)
        kvq = jnp.clip(kvv.astype(jnp.float32), -448,
                       448).astype(jnp.float8_e4m3fn)
        kvs = jnp.asarray(rng.rand(nb, bkv).astype(np.float32))
        btab = jnp.asarray(rng.permutation(nb).reshape(Bp, bps), jnp.int32)
        ctx = jnp.full((Bp,), mml, jnp.int32)
        qp = jnp.clip(jnp.asarray(rng.randn(Bp, nn2, h2, d2), jnp.float32),
                      -448, 448).astype(jnp.float8_e4m3fn)
        wp = jnp.asarray(rng.randn(Bp * nn2, h2).astype(np.float32))
        loop_pg = _loop(lambda i, q_, w_, kv_, ks_:
                        dg.fp8_fp4_paged_mqa_logits(
                            (jnp.roll(q_, i, 0), None), (kv_, ks_), w_, ctx,
                            btab, max_context_len=mml)[0, 0]
                        .astype(jnp.float32))
        t_pg = _device_time_of(loop_pg, (qp, wp, kvq, kvs), 'paged')
        cache_bytes = Bp * mml * d2                    # fp8 values once
        gbps = cache_bytes / t_pg / 1e9
        B.emit_op('fp8_paged_mqa_decode', round(gbps, 1), 'GB/s_effective',
                  round(gbps / HBM_GBPS, 3))

        # zero-copy strategy: cache pages stay in place (no second full-size
        # buffer), manual pipelined in-kernel DMAs; bitwise-equal to the
        # gather number above.
        loop_pz = _loop(lambda i, q_, w_, kv_, ks_:
                        dg.fp8_fp4_paged_mqa_logits(
                            (jnp.roll(q_, i, 0), None), (kv_, ks_), w_, ctx,
                            btab, max_context_len=mml,
                            strategy='paged')[0, 0].astype(jnp.float32))
        t_pz = _device_time_of(loop_pz, (qp, wp, kvq, kvs), 'paged_zc')
        gbps_z = cache_bytes / t_pz / 1e9
        B.emit_op('fp8_paged_mqa_decode_zerocopy', round(gbps_z, 1),
                  'GB/s_effective', round(gbps_z / HBM_GBPS, 3))

        # zero-copy with the serving PageAllocator's PAIR-ALIGNED layout
        # (logical pages (2i, 2i+1) physically adjacent): the kernel's
        # dynamic pair-coalescing folds each pair into ONE 16KB DMA —
        # the measured zc bound is the per-8KB DMA issue cost, so this is
        # the shipped serving configuration's number (the leg above keeps
        # the fully-scattered worst case). Same kernel, same bitwise
        # contract; only the block table differs.
        pairs_p = rng.permutation(nb // 2)
        btab_pair = jnp.asarray(
            np.stack([pairs_p * 2, pairs_p * 2 + 1], 1).reshape(Bp, bps),
            jnp.int32)
        loop_pp = _loop(lambda i, q_, w_, kv_, ks_:
                        dg.fp8_fp4_paged_mqa_logits(
                            (jnp.roll(q_, i, 0), None), (kv_, ks_), w_, ctx,
                            btab_pair, max_context_len=mml,
                            strategy='paged')[0, 0].astype(jnp.float32))
        t_pp = _device_time_of(loop_pp, (qp, wp, kvq, kvs), 'paged_zc_pair')
        gbps_p = cache_bytes / t_pp / 1e9
        B.emit_op('fp8_paged_mqa_decode_zerocopy_paired', round(gbps_p, 1),
                  'GB/s_effective', round(gbps_p / HBM_GBPS, 3))

        # zero-copy with the r5 QUAD-aligned allocator layout (logical
        # pages 4i..4i+3 physically adjacent): level-2 coalescing folds
        # each quad into ONE 32KB DMA (pure-DMA ceiling 732; measured
        # 682.5 = 0.833 of HBM on 2026-08-20, scripts/measure_zc_quad.py).
        quads_p = rng.permutation(nb // 4)
        btab_quad = jnp.asarray(
            np.stack([quads_p * 4 + j for j in range(4)], 1).reshape(Bp, bps),
            jnp.int32)
        loop_pq = _loop(lambda i, q_, w_, kv_, ks_:
                        dg.fp8_fp4_paged_mqa_logits(
                            (jnp.roll(q_, i, 0), None), (kv_, ks_), w_, ctx,
                            btab_quad, max_context_len=mml,
                            strategy='paged')[0, 0].astype(jnp.float32))
        t_pq = _device_time_of(loop_pq, (qp, wp, kvq, kvs), 'paged_zc_quad')
        gbps_q = cache_bytes / t_pq / 1e9
        B.emit_op('fp8_paged_mqa_decode_zerocopy_quad', round(gbps_q, 1),
                  'GB/s_effective', round(gbps_q / HBM_GBPS, 3))

    B.run('paged', leg_paged)

    if B.skipped:
        print(f'[bench] done with skips: {B.skipped}', file=sys.stderr,
              flush=True)
    # final headline (already emitted after the last leg; re-emit for the
    # pathological zero-legs case so the last line is always a headline)
    B.emit_headline()


if __name__ == '__main__':
    main()
