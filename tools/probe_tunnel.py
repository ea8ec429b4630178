"""Probe tunnel upload bandwidth and sharded-shape compile time."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    print(jax.devices(), flush=True)

    for mb in (16, 128, 410):
        arr = rng.integers(0, 1000, size=(mb * 1024 * 1024 // 4,),
                           ).astype(np.int32)
        t0 = time.perf_counter()
        d = jnp.asarray(arr)
        d.block_until_ready()
        _ = jax.device_get(d[:4])
        dt = time.perf_counter() - t0
        print(f"upload {mb}MB: {dt:.1f}s ({mb/dt:.0f} MB/s)", flush=True)
        del d

    # representative sharded scorer shapes (1M docs / 16 shards)
    from searchlite_tpu.ops.impact import make_impact_scorer

    scorer = make_impact_scorer()
    nb_rows = 800_001
    bdocs = jnp.asarray(
        rng.integers(0, 62501, size=(nb_rows, 128)).astype(np.int32))
    bimps = jnp.asarray(rng.random((nb_rows, 128), dtype=np.float32))
    deleted = jnp.zeros(62502, bool)
    blk_idx = jnp.asarray(
        rng.integers(0, nb_rows - 1, size=8192).astype(np.int32))
    slot_row = jnp.asarray(
        rng.integers(0, 4000, size=8192).astype(np.int32))
    w_idx = jnp.asarray(np.arange(8192, dtype=np.int32))
    w_val = jnp.asarray(rng.random(8192, dtype=np.float32))
    print("inputs resident", flush=True)
    t0 = time.perf_counter()
    s, i = scorer(bdocs, bimps, deleted, blk_idx, slot_row, w_idx, w_val,
                  k=10, s_pad=4096, n_queries=1024)
    _ = jax.device_get((s, i))
    print(f"sharded-shape compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        s, i = scorer(bdocs, bimps, deleted, blk_idx, slot_row,
                      w_idx, w_val, k=10, s_pad=4096, n_queries=1024)
    _ = jax.device_get((s, i))
    print(f"steady-state per shard call: "
          f"{(time.perf_counter()-t0)/4*1e3:.0f}ms", flush=True)


if __name__ == "__main__":
    main()
