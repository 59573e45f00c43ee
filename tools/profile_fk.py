"""FK kernel scaling probe: ms per fk_pallas call vs batch size.

Distinguishes latency-bound (flat vs B -> pack sublanes / cut grid
steps) from throughput-bound (linear in B -> cut work/bytes).  Amortized
inside one scan with a value dependency (tunnel RTT ~25 ms would
otherwise swamp the measurement).

    SIZES=128,512,1024,4096 AMORT=20 python tools/profile_fk.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mj_envs_tpu import envs
from mj_envs_tpu.physics import fk_kernel as FK

SIZES = [int(s) for s in os.environ.get(
    "SIZES", "128,512,1024,2048,4096").split(",")]
AMORT = int(os.environ.get("AMORT", "20"))
TASK = os.environ.get("TASK", "hammer-v0")


def main():
    env = envs.make(TASK)
    m = env.model
    mb = jax.tree.map(lambda x: False, m)
    print(f"backend={jax.default_backend()} task={TASK} amort={AMORT}",
          flush=True)
    for B in SIZES:
        key = jax.random.PRNGKey(0)
        st = jax.jit(jax.vmap(env.reset))(jax.random.split(key, B))
        qpos = st.data.qpos

        impl = os.environ.get("FK_IMPL", "pallas")
        if impl == "dummy":
            # Harness floor probe: a trivially cheap op in the same
            # amortized-scan shape.
            def one(q):
                return q * 1.000001
        elif impl == "pallas":
            def one(q):
                return FK.fk_pallas(m, q, mb)[0]
        else:
            from mj_envs_tpu.physics import kinematics as K
            m_axes = jax.tree.map(lambda b: None, mb)
            fn = (K._kinematics_parallel if impl == "parallel"
                  else K._kinematics_ref)

            def one(q):
                return jax.vmap(fn, in_axes=(m_axes, 0))(m, q).xpos

        def many(q):
            def body(carry, _):
                out = one(carry)
                return carry + 1e-30 * out.sum(), ()
            q, _ = jax.lax.scan(body, q, (), length=AMORT)
            return q
        f = jax.jit(many)
        out = f(qpos)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(qpos)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / AMORT)
        print(f"B={B:5d}  {best * 1e3:8.3f} ms/call  "
              f"{best / B * 1e9:8.1f} ns/env", flush=True)


if __name__ == "__main__":
    main()
