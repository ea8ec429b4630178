#!/bin/bash
# Run every hardware measurement in sequence with per-step timeouts,
# logging to /tmp/benchrun/. Fire this the moment the TPU tunnel is up:
#     bash tools/run_all_benches.sh
# Results summarized at the end; each step tolerates failure and moves
# on (the tunnel has a history of wedging mid-run).

set -u
cd "$(dirname "$0")/.."
OUT=${BENCH_OUT:-/tmp/benchrun}
mkdir -p "$OUT"

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
}

# 0. probe (fail fast if the tunnel is down)
step probe 300 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print('probe ok', float(np.asarray(jax.device_get(x @ x))[0, 0]))
print('devices', jax.devices())
"
grep -q "probe ok" "$OUT/probe.log" || { echo "TUNNEL DOWN — abort" | tee -a "$OUT/summary.log"; exit 2; }

# 1. headline bench (BENCH_r02 material)
step bench_headline 2500 python bench.py

# 2. stage profile of the default split path (scatter/matmul/topk)
step profile_split 2000 python tools/profile_split.py

# 3. headline with bit-exact f32 dots (the cost of strict parity, D8)
step bench_strict 2500 env SEARCHLITE_PRECISION=f32_strict python bench.py

# 3b. headline with the dense split OFF (the split's delta)
step bench_nosplit 2500 env SEARCHLITE_DENSE_M_BYTES=0 python bench.py

# 4. micro scenarios (criterion parity + pruned scenario)
step micro 2500 python benches/micro.py

# 5. 1M-doc batched QPS (doc-sharded path)
step bench_1m 3600 python tools/bench_1m.py

# 6. 5M-doc MS-MARCO-shaped scale run (bm25 + bmw)
step bench_scale_5m 7200 python tools/bench_scale.py 5000000

# 7. raw matmul+topk probe (achieved FLOPs / sync-latency sanity)
step probe_matmul 900 python tools/probe_matmul.py

# 8. strategy comparison demo (bm25 vs wand vs bmw, exactness asserted)
step strategy 2500 python tools/strategy_compare.py 200000 30

# 9. BASELINE config sweep (quickstart CLI / recipes / video-games)
step configs 2000 python benches/configs.py

# 10. host-phase attribution of the batched stream (both surfaces,
#     SEARCHLITE_HOST_PROFILE splits prep/dispatch/fetch/merge)
step probe_phases 2500 python tools/probe_batch_phases.py

# 11. batch-width + packed/explicit + light/heavy boundary sweep
step probe_stream 2500 python tools/probe_stream.py

# 12. vector + hybrid scale (exact MXU similarity, in-run exactness)
step bench_vectors 3600 python tools/bench_vectors.py 500000 128

# 13. engine-side ingest throughput (host-only; needs an idle host)
step bench_ingest 900 python tools/bench_ingest.py 500000

echo "ALL DONE ($(date -u +%H:%M:%S))" | tee -a "$OUT/summary.log"
