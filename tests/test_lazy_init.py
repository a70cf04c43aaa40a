"""Fork-safety test — parity with /root/reference/tests/test_lazy_init.py:
importing the library must not initialize any backend/device state, so child
processes forked after import can use it independently (the LazyInit design,
/root/reference/csrc/utils/lazy_init.hpp:10-26; here: lazy runtime singletons
+ lazy native-library load + lazy JAX backend init).

The scenario runs in a fresh subprocess because the pytest process itself has
already initialized an XLA backend (forking after backend init is the exact
hazard the lazy design avoids).
"""

import os
import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent("""
    import multiprocessing as mp
    import os, sys

    import deepgemm_tpu as dg           # import FIRST (the hazard under test)
    from deepgemm_tpu.runtime import native

    def child(rank, q):
        try:
            import numpy as np
            import jax
            jax.config.update('jax_platforms', 'cpu')
            import jax.numpy as jnp
            a = jnp.asarray(np.random.RandomState(rank).randn(8, 128),
                            jnp.bfloat16)
            qv, sf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
            assert qv.shape == (8, 128) and sf.shape == (8, 1)
            assert native.fnv1a(b'abc') == native._fnv1a_py(b'abc')
            q.put((rank, 'ok'))
        except Exception as e:
            q.put((rank, repr(e)))

    ctx = mp.get_context('fork')
    q = ctx.Queue()
    procs = [ctx.Process(target=child, args=(r, q)) for r in range(8)]
    [p.start() for p in procs]
    results = [q.get(timeout=180) for _ in procs]
    [p.join(timeout=180) for p in procs]
    bad = [r for r in results if r[1] != 'ok']
    assert not bad, bad
    print('FORK_OK', len(results))
""")


def test_fork_after_import():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    # force CPU before any import (axon sitecustomize workaround)
    code = ("import jax; jax.config.update('jax_platforms', 'cpu')\n"
            + _SCRIPT)
    out = subprocess.run([sys.executable, '-c', code], env=env,
                         capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert 'FORK_OK 8' in out.stdout
