"""Fused dispatch+GEMM kernel test (kernels/fused_moe.py) — the in-kernel
RDMA analog of the mega kernel's phase-1 (dispatch pulls overlapping the L1
GEMM, /root/reference/deep_gemm/include/deep_gemm/impls/sm100_fp8_fp4_mega_moe.cuh:432-877).

Runs on a 2-device submesh: the distributed Pallas interpreter simulates one
python thread per device, and this CI box has a single core — D=2 keeps the
simulation inside the time budget while still exercising the remote-DMA +
semaphore protocol end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from deepgemm_tpu.kernels.fused_moe import fused_dispatch_gemm
from deepgemm_tpu.parallel.dist import make_mesh
from deepgemm_tpu.testing import calc_diff


def test_fused_dispatch_gemm():
    D, EL, CAP, H, N = 2, 2, 16, 128, 256
    mesh = make_mesh([('ep', D)])
    rng = np.random.RandomState(0)
    send = jnp.asarray(rng.randn(D * D, EL, CAP, H), jnp.bfloat16)
    w = jnp.asarray(rng.randn(D * EL, N, H) * 0.1, jnp.bfloat16)

    def f(send_l, w_l):
        return fused_dispatch_gemm(send_l, w_l, 'ep')

    out, recv = shard_map(f, mesh=mesh, check_vma=False,
                          in_specs=(P('ep'), P('ep')),
                          out_specs=(P('ep'), P('ep')))(send, w)
    out = np.asarray(out).reshape(D, EL, D, CAP, N)
    recv = np.asarray(recv, np.float32).reshape(D, D, EL, CAP, H)
    send_np = np.asarray(send, np.float32).reshape(D, D, EL, CAP, H)
    w_np = np.asarray(w, np.float32).reshape(D, EL, N, H)

    for r in range(D):           # receiving rank
        for s in range(D):       # source rank (wrapper output is src-ordered)
            # recv pool holds exactly what src routed to r
            np.testing.assert_array_equal(recv[r, s], send_np[s, r])
            for e in range(EL):
                ref = send_np[s, r, e] @ w_np[r, e].T
                assert calc_diff(out[r, e, s], ref) < 1e-4, (r, s, e)
