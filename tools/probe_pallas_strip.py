"""A/B the strip cores: production lax.sort vs jnp bitonic vs fused
Pallas VMEM kernel (VERDICT r3 item 7).

Builds realistic strips — T doc-sorted posting segments per row drawn
Zipf-style from an n1-doc corpus, concatenated and padded with
sentinels, exactly the layout _strip_gather_scan produces — then runs
the three cores on the device and reports ms/step at several [B, L]
shapes. Exactness: bitonic/pallas top-k must match the production
core's (score, doc) rows bit-for-bit (same f32 run-sum order: both
combine with the same shifted-add network over doc-adjacent runs...
NOTE the bitonic sort is unstable, but run sums are order-free because
every element of a run is added exactly once).

Usage: python tools/probe_pallas_strip.py [--cpu] [--interpret]
Prints one JSON line per (shape, core).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

K = 10
T_PAD = 4
LOG2_RUN = 3


def log(**kv):
    print(json.dumps(kv), flush=True)


def build_strips(rng, B, L, n1):
    """[B, L] (d, v): T_PAD doc-sorted segments + sentinel tail."""
    d = np.full((B, L), n1 - 1, dtype=np.int32)
    v = np.zeros((B, L), dtype=np.float32)
    per = L // (T_PAD + 1)  # leave a padded tail like real tiers
    for b in range(B):
        cur = 0
        for t in range(T_PAD):
            n = int(rng.integers(per // 2, per))
            docs = np.unique(rng.integers(0, n1, n)).astype(np.int32)
            n = len(docs)
            d[b, cur:cur + n] = docs
            v[b, cur:cur + n] = rng.random(n, dtype=np.float32) + 0.1
            cur += n
    return d, v


def fetch(x):
    import jax

    return np.asarray(jax.device_get(x))


def main():
    force_cpu = "--cpu" in sys.argv
    interpret = "--interpret" in sys.argv

    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from searchlite_tpu.utils.devguard import guard_backend

        guard_backend(__file__)
    log(phase="start", backend=jax.default_backend())

    from searchlite_tpu.ops.pallas_strip import (make_pallas_strip_core,
                                                 make_xla_bitonic_core)
    from searchlite_tpu.ops.sparse import make_strip_prune_probe

    _, sort_core = make_strip_prune_probe()
    bitonic_core = make_xla_bitonic_core()
    pallas_core = make_pallas_strip_core(interpret=interpret)

    rng = np.random.default_rng(11)
    shapes = [(1024, 1024), (1024, 4096), (256, 16384)]
    if force_cpu or interpret:
        shapes = [(32, 512)]
    for B, L in shapes:
        n1 = 100_000
        d_np, v_np = build_strips(rng, B, L, n1)
        d = jax.device_put(d_np)
        v = jax.device_put(v_np)
        sent = n1 - 1

        # production core (t_of/c unused by sort_core)
        t_of = jax.device_put(np.zeros((B, L), dtype=np.int32))

        def run_sort():
            ts, td, _ok = sort_core(d, v, t_of, sent, k=K, c=64,
                                    t_pad=T_PAD, log2_run=LOG2_RUN)
            return fetch(ts), fetch(td)

        def run_bitonic():
            ts, td = bitonic_core(d, v, sent, k=K, log2_run=LOG2_RUN)
            return fetch(ts), fetch(td)

        def run_pallas():
            ts, td = pallas_core(d, v, sent, k=K, log2_run=LOG2_RUN)
            return fetch(ts), fetch(td)

        cores = [("sort", run_sort), ("bitonic", run_bitonic),
                 ("pallas", run_pallas)]
        # device-side repetition: a single step's wall time over the
        # tunnel is RTT/fetch-floored (~55 ms regardless of core or
        # shape — the first version of this probe "measured" exactly
        # that), so each timed sample runs the core INNER times inside
        # one jit with a data dependency chain (the previous step's
        # top score perturbs one input lane by ~1 ulp-of-nothing; the
        # compiler cannot elide it, the arithmetic is unchanged at
        # f32) and fetches once.
        INNER = 8 if not (force_cpu or interpret) else 2

        def make_many(core_fn):
            def once(dd, vv):
                r = core_fn(dd, vv)
                return r[0], r[1]

            @jax.jit
            def many(dd, vv):
                def body(_i, carry):
                    vv2, _ts, _td = carry
                    ts, td = once(dd, vv2)
                    vv2 = vv2 + ts[0, 0] * 1e-38
                    return vv2, ts, td

                z = jnp.zeros((B, K), jnp.float32)
                zi = jnp.zeros((B, K), jnp.int32)
                _, ts, td = jax.lax.fori_loop(
                    0, INNER, body, (vv, z, zi))
                return ts, td

            return many

        import jax.numpy as jnp

        manys = {
            "sort": make_many(lambda dd, vv: sort_core(
                dd, vv, t_of, sent, k=K, c=64, t_pad=T_PAD,
                log2_run=LOG2_RUN)[:2]),
            "bitonic": make_many(lambda dd, vv: bitonic_core(
                dd, vv, sent, k=K, log2_run=LOG2_RUN)),
            "pallas": make_many(lambda dd, vv: pallas_core(
                dd, vv, sent, k=K, log2_run=LOG2_RUN)),
        }
        ref = None
        for name, fn in cores:
            try:
                out = fn()  # warm/compile + exactness sample
                many = manys[name]
                mout = many(d, v)
                jax.device_get(mout[0])  # warm the looped form
            except Exception as e:  # noqa: BLE001 — Mosaic may reject
                import traceback
                tb = traceback.format_exc().splitlines()
                log(shape=[B, L], core=name,
                    error=f"{type(e).__name__}: {str(e)[:300]}",
                    tb_tail=tb[-12:])
                continue
            reps = 4
            t0 = time.perf_counter()
            for _ in range(reps):
                ts, td = many(d, v)
                jax.device_get((ts, td))
            dt = time.perf_counter() - t0
            ms = dt / (reps * INNER) * 1e3
            if ref is None:
                ref = out
                exact = True
            else:
                # docs must match exactly on live lanes (-inf lanes
                # carry unspecified ids in every core); scores to
                # f32-ulp tolerance (the unstable bitonic can order
                # equal docs within a run differently -> different f32
                # summation order, the same class of divergence the
                # engine's paths already tolerate, D10)
                live = ref[0] > -np.inf
                exact = (np.array_equal(ref[1][live], out[1][live])
                         and np.allclose(ref[0], out[0], rtol=2e-6,
                                         atol=1e-6))
            log(shape=[B, L], core=name, ms_per_step=round(ms, 3),
                inner=INNER, exact_vs_sort=bool(exact))


if __name__ == "__main__":
    main()
