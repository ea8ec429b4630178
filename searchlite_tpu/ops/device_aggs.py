"""Device-side aggregation partials: bucket counts and stats computed
ON DEVICE from the match mask, so multi-million-doc aggregation queries
fetch a few KB of partials instead of a full doc-axis bool mask (a
~5 MB transfer per segment per query at 5M docs over the host link).

The split that keeps results BIT-identical to the host collectors
(`query/aggs.py`) while moving the per-query work on device:

- per-(field, spec-params) **bucket codes** are computed on the HOST in
  the same f64 arithmetic the host collectors use (histogram keys,
  range membership, dictionary ids), uploaded once and cached on the
  DeviceSegment — they depend on the spec, not on the query's matches;
- the per-QUERY reduction — ``counts[c] = Σ_d mask[d]·[code[d]=c]`` —
  runs on device against the resident match mask.

Covered kinds on their vectorizable subset (single-valued fast column,
no sub-aggs / ``missing`` / sampling — the same subset the host
collectors fast-path): ``terms``, ``histogram``, ``range``,
``value_count``, ``stats``. All counts are exact integers. ``stats``
min/max/count are exact (gated to values inside the f32-exact integer
range); its ``sum`` accumulates in f32 on device where the host sums
in f64 — a D8-class divergence, so ``f32_strict`` routes stats to the
host collector (reader gating).

TPU note: bincount-style scatter-adds COLLIDE and serialize on TPU
(CLAUDE.md scatter model), so bucket counts are a one-hot contraction
``counts = maskᵀ @ onehot(codes)`` scanned over fixed doc chunks: the
one-hot tile is generated and consumed in VMEM and the MXU does the
reduction (the standard TPU histogram mapping).

Reference semantics reproduced: per-segment intermediates merged across
segments (`/root/reference/searchlite-core/src/query/aggs/mod.rs:
2049-2068`); the mesh variants psum the same partials over ICI
(parallel/query.py).
"""

from __future__ import annotations

import json
from functools import partial

import numpy as np

CHUNK = 8192  # docs per one-hot scan step: [CHUNK, C] stays VMEM-sized

DEVICE_AGG_KINDS = ("terms", "histogram", "range", "stats",
                    "value_count")
_F32_EXACT = float(1 << 24)


def _pad_to_chunks(jnp, x, fill):
    n = x.shape[0]
    n_pad = -(-n // CHUNK) * CHUNK
    if n_pad == n:
        return x
    return jnp.concatenate(
        [x, jnp.full((n_pad - n,), fill, dtype=x.dtype)])


def bucket_counts_local(jnp, codes, mask, n_buckets: int):
    """Shared local kernel (single chip AND per-mesh-chip): exact
    integer counts of ``codes`` (−1 = none) over ``mask``, as a scanned
    one-hot MXU contraction. f32 accumulation is exact here: per-chunk
    partials are ≤ CHUNK and the final tree sums integers < 2^24 per
    bucket... for larger corpora the chunk partials are summed as f32
    integers which stay exact until 2^24; segments are bounded well
    below 16.7M matched docs per bucket per segment shard."""
    import jax

    codes = _pad_to_chunks(jnp, codes.astype(jnp.int32), -1)
    maskf = _pad_to_chunks(jnp, mask.astype(jnp.float32), 0.0)
    n_chunks = codes.shape[0] // CHUNK
    codes2 = codes.reshape(n_chunks, CHUNK)
    mask2 = maskf.reshape(n_chunks, CHUNK)
    iota = jnp.arange(n_buckets, dtype=jnp.int32)

    def step(acc, args):
        c, m = args
        onehot = (c[:, None] == iota[None, :]).astype(jnp.float32)
        return acc + jnp.dot(m[None, :], onehot,
                             preferred_element_type=jnp.float32)[0], None

    acc0 = jnp.zeros(n_buckets, dtype=jnp.float32)
    total, _ = jax.lax.scan(step, acc0, (codes2, mask2))
    return total.astype(jnp.int32)


def make_bucket_counts():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n_buckets",))
    def counts(codes, mask, *, n_buckets: int):
        return bucket_counts_local(jnp, codes, mask, n_buckets)

    return counts


def make_stats_partial():
    """(count, sum, min, max) over masked docs that HAVE a value.
    count/min/max exact (see gating); sum is f32-accumulated."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stats(vals, has, mask):
        ok = has & mask
        okf = ok.astype(jnp.float32)
        count = jnp.sum(okf, dtype=jnp.float32)
        masked = jnp.where(ok, vals, 0.0)
        total = jnp.sum(masked, dtype=jnp.float32)
        total_sq = jnp.sum(masked * masked, dtype=jnp.float32)
        vmin = jnp.min(jnp.where(ok, vals, jnp.inf))
        vmax = jnp.max(jnp.where(ok, vals, -jnp.inf))
        return count, total, total_sq, vmin, vmax

    return stats


# ---------------------------------------------------------------------------
# Host-side bucket-code structures (cached per segment + spec params)
# ---------------------------------------------------------------------------

def _col_first_values(dseg, field: str):
    """(values_f64 [n_docs], present [n_docs], col) for a single-valued
    numeric column; None when missing/multi-valued/str."""
    col = dseg.reader.fast.column(field)
    if col is None or col.is_list or col.kind == "str":
        return None
    present = np.diff(col.offsets) > 0
    first = col.offsets[:-1][present]
    vals = np.zeros(dseg.n_docs, dtype=np.float64)
    vals[present] = col.values[first].astype(np.float64)
    return vals, present, col


def agg_bucket_structure(dseg, spec: dict, kind: str):
    """Device-resident bucket codes for (segment, spec): dict with
    "codes" [n1] int32 (−1 = bucket-less), "n_buckets", and "keys"
    (bucket key per code, host list). Cached on the DeviceSegment by a
    spec-params key; None when the spec can't run device-side."""
    cache = getattr(dseg, "_agg_structs", None)
    if cache is None:
        cache = dseg._agg_structs = {}
    field = spec.get("field")
    if kind == "terms":
        params = (kind, field)
    elif kind == "histogram":
        params = (kind, field, float(spec.get("interval", 0) or 0),
                  float(spec.get("offset", 0) or 0))
    elif kind == "range":
        params = (kind, field,
                  json.dumps(spec.get("ranges", []), sort_keys=True))
    else:  # stats / value_count share the value structure
        params = ("value", field)
    if params in cache:
        return cache[params]
    import jax.numpy as jnp

    out = None
    n1 = dseg.n1
    if kind == "terms":
        col = dseg.reader.fast.column(field)
        if col is not None and not col.is_list and col.kind == "str" \
                and len(col.dictionary) <= 65536:
            present = np.diff(col.offsets) > 0
            first = col.offsets[:-1][present]
            codes = np.full(n1, -1, dtype=np.int32)
            codes[:dseg.n_docs][present] = col.values[first]
            out = {"codes": jnp.asarray(codes),
                   "n_buckets": max(len(col.dictionary), 1),
                   "keys": list(col.dictionary)}
    elif kind == "histogram":
        got = _col_first_values(dseg, field)
        interval = float(spec.get("interval", 0) or 0)
        offset = float(spec.get("offset", 0) or 0)
        if got is not None and interval > 0:
            vals, present, _col = got
            # EXACT host f64 keys — identical to
            # query/aggs.py::_histogram_key
            keys = np.floor((vals - offset) / interval) * interval \
                + offset
            if present.any():
                uniq = np.unique(keys[present])
            else:
                uniq = np.zeros(0, dtype=np.float64)
            if len(uniq) <= 65536:
                codes = np.full(n1, -1, dtype=np.int32)
                if len(uniq):
                    idx = np.searchsorted(uniq, keys)
                    idx = np.minimum(idx, len(uniq) - 1)
                    okk = present & (uniq[idx] == keys)
                    codes[:dseg.n_docs][okk] = idx[okk]
                out = {"codes": jnp.asarray(codes),
                       "n_buckets": max(len(uniq), 1),
                       "keys": uniq.tolist()}
    elif kind == "range":
        got = _col_first_values(dseg, field)
        ranges = spec.get("ranges", [])
        if got is not None and ranges:
            vals, present, _col = got
            # ranges may OVERLAP: one bool row per range (exact host
            # f64 comparisons, same as _collect_range), device counts
            # each row independently
            rows = np.zeros((len(ranges), n1), dtype=bool)
            for i, r in enumerate(ranges):
                lo = r.get("from")
                hi = r.get("to")
                m = present.copy()
                if lo is not None:
                    m &= vals >= float(lo)
                if hi is not None:
                    m &= vals < float(hi)
                rows[i, :dseg.n_docs] = m
            out = {"range_rows": jnp.asarray(rows),
                   "n_buckets": len(ranges)}
    else:  # stats / value_count value structure
        got = _col_first_values(dseg, field)
        if got is not None:
            vals, present, _col = got
            # f32-exact gate: min/max must round-trip exactly (large
            # i64 values — e.g. epoch millis — don't fit f32)
            in_range = (not present.any()
                        or bool((np.abs(vals[present])
                                 <= _F32_EXACT).all()))
            if in_range:
                v32 = np.zeros(n1, dtype=np.float32)
                v32[:dseg.n_docs] = vals.astype(np.float32)
                has = np.zeros(n1, dtype=bool)
                has[:dseg.n_docs] = present
                out = {"vals": jnp.asarray(v32),
                       "has": jnp.asarray(has)}
    cache[params] = out
    return out


def make_range_counts():
    """counts[r] = Σ_d mask[d]·rows[r, d] — exact (rows are host-f64
    -derived bools), one small MXU contraction."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def ranges(rows, mask):
        return jnp.dot(rows.astype(jnp.float32),
                       mask.astype(jnp.float32),
                       preferred_element_type=jnp.float32
                       ).astype(jnp.int32)

    return ranges


def spec_device_able(dseg, spec: dict, kind: str, strict: bool) -> bool:
    """Can this aggregation spec reduce device-side on this segment?"""
    if kind not in DEVICE_AGG_KINDS:
        return False
    if spec.get("aggs") or spec.get("missing") is not None \
            or spec.get("sampling") is not None \
            or spec.get("hard_bounds") is not None:
        return False
    if kind == "stats" and strict:
        return False  # device sum is f32; strict keeps host f64
    if spec.get("field") is None:
        return False
    return agg_bucket_structure(dseg, spec, kind) is not None


# ---------------------------------------------------------------------------
# Launch + intermediate reconstruction (single-chip path)
# ---------------------------------------------------------------------------

_KERNELS: dict = {}


def _kernel(name, factory):
    k = _KERNELS.get(name)
    if k is None:
        k = _KERNELS[name] = factory()
    return k


def plan_device_aggs(dseg, aggs: dict, strict: bool):
    """Return a launch plan when EVERY non-pipeline aggregation of the
    request can reduce device-side on this segment, else None."""
    from searchlite_tpu.query.aggs import PIPELINE_AGGS, agg_kind

    plan = []
    for name, spec in (aggs or {}).items():
        kind = agg_kind(spec)
        if kind in PIPELINE_AGGS:
            continue
        if not spec_device_able(dseg, spec, kind, strict):
            return None
        plan.append((name, spec, kind))
    return plan


def launch_device_aggs(dseg, plan, mask_ref):
    """Dispatch the plan's reductions against a device-resident match
    mask ([n1] bool ref, sentinel False). Returns (meta, refs): flat
    device refs to fetch and per-agg reconstruction metadata."""
    refs = []
    meta = []
    for name, spec, kind in plan:
        struct = agg_bucket_structure(dseg, spec, kind)
        if kind in ("terms", "histogram"):
            counts = _kernel("bucket", make_bucket_counts)(
                struct["codes"], mask_ref,
                n_buckets=struct["n_buckets"])
            meta.append((name, kind, struct, 1))
            refs.append(counts)
        elif kind == "range":
            counts = _kernel("range", make_range_counts)(
                struct["range_rows"], mask_ref)
            meta.append((name, kind, struct, 1))
            refs.append(counts)
        elif kind == "value_count":
            c, *_rest = _kernel("stats", make_stats_partial)(
                struct["vals"], struct["has"], mask_ref)
            meta.append((name, kind, struct, 1))
            refs.append(c)
        else:  # stats
            out = _kernel("stats", make_stats_partial)(
                struct["vals"], struct["has"], mask_ref)
            meta.append((name, kind, struct, len(out)))
            refs.extend(out)
    return meta, refs


def build_intermediates(meta, fetched) -> dict:
    """Reconstruct query/aggs.py Intermediates from fetched partials —
    the exact shapes the host collectors produce, so merge/finalize
    and cross-segment merges are oblivious to where collection ran."""
    import math

    from searchlite_tpu.query.aggs import (
        BucketIntermediate,
        Intermediate,
    )

    it = iter(fetched)
    out = {}
    for name, kind, struct, n_refs in meta:
        vals = [np.asarray(next(it)) for _ in range(n_refs)]
        if kind in ("terms", "histogram"):
            counts = vals[0]
            buckets = {}
            for code in np.flatnonzero(counts):
                buckets[struct["keys"][code]] = BucketIntermediate(
                    doc_count=int(counts[code]))
            out[name] = Intermediate(kind, {"buckets": buckets})
        elif kind == "range":
            counts = vals[0]
            out[name] = Intermediate("range", {
                "buckets": [BucketIntermediate(doc_count=int(c))
                            for c in counts]})
        elif kind == "value_count":
            out[name] = Intermediate("value_count",
                                     {"value": int(vals[0])})
        else:  # stats
            count, total, total_sq, vmin, vmax = (float(v)
                                                  for v in vals)
            if count == 0:
                out[name] = Intermediate("stats", {
                    "count": 0, "sum": 0.0, "sum_sq": 0.0,
                    "min": math.inf, "max": -math.inf})
            else:
                out[name] = Intermediate("stats", {
                    "count": int(count), "sum": total,
                    "sum_sq": total_sq, "min": vmin, "max": vmax})
    return out
