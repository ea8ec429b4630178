"""Raw device matmul probe: times the headline bench's scoring shape
([Q,S] @ [S,N] f32 + top-k, result fetched) and prints achieved FLOP/s.

Purpose: sanity-check what the 'one device' abstraction actually
delivers. A single v5e tops out around ~2e14 bf16 FLOP/s; sustained
rates far above that mean the tunnel is scheduling independent
dispatches across a pool, which changes how batched-QPS numbers should
be read (throughput of the serving setup, not of one chip).

Usage: python tools/probe_matmul.py [Q S N reps]
"""

import sys
import time

import numpy as np
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from searchlite_tpu.utils.devguard import guard_backend  # noqa: E402

guard_backend(__file__)


def main():
    q, s, n, reps = 1024, 4096, 100_001, 8
    if len(sys.argv) > 4:
        q, s, n, reps = (int(x) for x in sys.argv[1:5])
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random((q, s), dtype=np.float32))
    m = jnp.asarray(rng.random((s, n), dtype=np.float32))

    @jax.jit
    def step(w, m):
        scores = jnp.dot(w, m, preferred_element_type=jnp.float32)
        return jax.lax.top_k(scores, 10)

    # warm + correctness spot check
    ts, ti = step(w, m)
    ts_np = np.asarray(ts)
    want = np.asarray(w[:1]) @ np.asarray(m)
    assert np.allclose(ts_np[0, 0], want.max(), rtol=1e-4), \
        (float(ts_np[0, 0]), float(want.max()))

    flops = 2.0 * q * s * n
    # serial: fetch each result before the next dispatch
    t0 = time.perf_counter()
    for _ in range(reps):
        ts, ti = step(w, m)
        np.asarray(ts[0, 0])
    dt_serial = time.perf_counter() - t0
    # pipelined: dispatch all, fetch at the end (the bench's pattern)
    t0 = time.perf_counter()
    refs = [step(w, m) for _ in range(reps)]
    for ts, ti in refs:
        np.asarray(ts[0, 0])
    dt_pipe = time.perf_counter() - t0
    print(f"shape [{q},{s}]x[{s},{n}] reps={reps}")
    print(f"serial:    {dt_serial / reps * 1000:.1f} ms/step, "
          f"{flops * reps / dt_serial / 1e12:.1f} TFLOP/s")
    print(f"pipelined: {dt_pipe / reps * 1000:.1f} ms/step, "
          f"{flops * reps / dt_pipe / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
