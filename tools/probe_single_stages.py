"""Decompose single-query latency into host-Python vs device-fetch
components (VERDICT r4 #4: measure the RTT-floored p50's non-RTT
part at scale instead of asserting it).

Method: wrap ``jax.device_get`` with a timer during warmed single
searches — every device->host sync in the engine rides it — so
``wall = host_python + sum(fetch_wait)``; separately measure the bare
tunnel RTT floor (dispatch+fetch of a trivial 1-element computation,
which pays sync latency but ~zero device work / transfer). Then

    device_plus_transfer ~= fetch_wait_p50 - rtt_floor_p50

is the part a locally-attached TPU would still pay, and
``host_python`` is the per-query host bill. One JSON line per
execution mode, plus the RTT floor row.

Usage: python tools/probe_single_stages.py <index_path> [--reps N]
       [--queries N] [--execution bmw,bm25]
Needs the device (run solo; see CLAUDE.md tunnel discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(**kv):
    print(json.dumps(kv), flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not args:
        print("usage: probe_single_stages.py <index_path>",
              file=sys.stderr)
        sys.exit(2)
    path = args[0]
    reps = 15
    n_queries = 9
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--queries" in sys.argv:
        n_queries = int(sys.argv[sys.argv.index("--queries") + 1])
    executions = ["default", "bmw"]
    if "--execution" in sys.argv:
        executions = sys.argv[
            sys.argv.index("--execution") + 1].split(",")

    import numpy as np

    import jax
    import jax.numpy as jnp

    from searchlite_tpu.api.types import IndexOptions
    from searchlite_tpu.index import Index
    from searchlite_tpu.utils.devguard import guard_backend

    guard_backend("probe_single_stages")

    # RTT floor: trivial jitted computation, 1-element fetch. The
    # chain through the input defeats constant folding; each rep
    # pays dispatch + sync + minimal transfer.
    @jax.jit
    def _tiny(x):
        return x + 1.0

    x = jnp.zeros((1,), jnp.float32)
    x = _tiny(x)
    float(jax.device_get(x)[0])  # warm compile
    rtts = []
    for _ in range(30):
        t0 = time.perf_counter()
        y = _tiny(x)
        float(jax.device_get(y)[0])
        rtts.append((time.perf_counter() - t0) * 1000)
    rtt_p50 = float(np.percentile(rtts, 50))
    log(metric="rtt_floor_ms", p50=round(rtt_p50, 2),
        p10=round(float(np.percentile(rtts, 10)), 2),
        p90=round(float(np.percentile(rtts, 90)), 2))

    idx = Index.open(IndexOptions(path=path, create_if_missing=False))
    reader = idx.reader()
    # the exact query protocol the quoted p50 rows use: bench_scale's
    # rank-skewed generator (one zipf head term + 1-5 uniform
    # mid/tail), same seed as its p50 loop (queries[:n_queries])
    from tools.bench_scale import build_queries

    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(120_000)]
    queries = build_queries(rng, max(n_queries, 9), vocab)[:n_queries]

    real_get = jax.device_get
    state = {"wait": 0.0, "calls": 0}

    def timed_get(tree):
        t0 = time.perf_counter()
        out = real_get(tree)
        state["wait"] += time.perf_counter() - t0
        state["calls"] += 1
        return out

    for execution in executions:
        req = {"limit": 10}
        if execution != "default":
            req["execution"] = execution
        for q in queries:  # warm every bucket
            reader.search(dict(req, query=q))
        walls, waits, calls = [], [], []
        jax.device_get = timed_get
        try:
            for _ in range(reps):
                for q in queries:
                    state["wait"] = 0.0
                    state["calls"] = 0
                    t0 = time.perf_counter()
                    reader.search(dict(req, query=q))
                    walls.append((time.perf_counter() - t0) * 1000)
                    waits.append(state["wait"] * 1000)
                    calls.append(state["calls"])
        finally:
            jax.device_get = real_get
        wall_p50 = float(np.percentile(walls, 50))
        wait_p50 = float(np.percentile(waits, 50))
        log(metric="single_query_stages", execution=execution,
            n_docs=int(sum(s.doc_count for s in
                           idx.manifest.segments)),
            wall_p50_ms=round(wall_p50, 2),
            fetch_wait_p50_ms=round(wait_p50, 2),
            host_python_p50_ms=round(wall_p50 - wait_p50, 2),
            fetches_per_query_p50=float(np.percentile(calls, 50)),
            rtt_floor_p50_ms=round(rtt_p50, 2),
            device_plus_transfer_est_ms=round(
                wait_p50 - rtt_p50 * float(
                    np.percentile(calls, 50)), 2))


if __name__ == "__main__":
    main()
