"""Pallas strip-core experiment: fused sort+combine+top-k over
candidate strips (VERDICT r3 item 7).

The sparse candidate scorer's hot step is ``lax.sort`` over gathered
``[B, L]`` (doc, value) strips followed by a segmented run-combine and
``lax.top_k`` (ops/sparse.py::_strip_gather_scan — profile_strips
measured the sort at ~70% of the fused step). This module holds the
experiment the round-3 verdict asked for: can a hand-written bitonic
network — plain-XLA or fused into one Pallas VMEM kernel — beat the
XLA sort HLO?

Three comparable cores, all bit-equivalent to the production
``sort_core`` contract (score desc / doc asc top-k over run-combined
duplicate docs, -inf for non-matches):

1. production: ``lax.sort`` + shifted adds + ``lax.top_k``
   (ops/sparse.py — the baseline).
2. ``make_xla_bitonic_core()``: the same algorithm with the sort
   replaced by `bitonic_sort_pairs` — a hand-rolled compare-exchange
   network in pure jnp (no Pallas), isolating "is the sort HLO itself
   the cost?".
3. ``make_pallas_strip_core()``: one ``pl.pallas_call`` per strip that
   keeps a row block resident in VMEM through sort, run-combine, and
   an iterative k-extract — isolating "does fusing the stages into
   VMEM pay?".

A/B tool: tools/probe_pallas_strip.py (runs all three on device over
realistic Zipf strips and checks exact agreement). The production
candidate scorers (ops/sparse.py) take the core as a static arg wired
to SEARCHLITE_STRIP_CORE=sort|bitonic|pallas (default sort); wire-in
decision and measured numbers are recorded in docs/architecture.md —
the default only switches if a core wins on hardware.

Production strips are pow15-bucketed (L = nblk·128 is not always a
power of two), so the bitonic/pallas cores pad to the next pow2 with
(sentinel, 0) pairs — sentinel is the corpus' largest doc id, pads
sort to the tail and the ok-mask drops them. That pad is ≤ 33% extra
sort work; the A/B numbers quoted for pow2 shapes are the
best case for these cores.
"""

from __future__ import annotations

from functools import partial

K_PAD = 128  # output lane padding (Mosaic wants 128-divisible lanes)


def bitonic_sort_pairs(jax, jnp, d, v):
    """Ascending bitonic sort of ``d`` [R, L] (int32 keys) along axis 1
    with ``v`` co-permuted. L must be a power of two. Unstable — the
    strip contract only needs equal docs adjacent (run sums are
    order-free)."""
    R, L = d.shape
    n = L.bit_length() - 1
    assert (1 << n) == L, "strip length must be a power of two"
    for k in range(1, n + 1):
        for sub in range(k - 1, -1, -1):
            s = 1 << sub
            g = L // (2 * s)
            d4 = d.reshape(R, g, 2, s)
            v4 = v.reshape(R, g, 2, s)
            da, db = d4[:, :, 0, :], d4[:, :, 1, :]
            va, vb = v4[:, :, 0, :], v4[:, :, 1, :]
            if k == n:
                # final merge stage: globally ascending everywhere
                swap = da > db
            else:
                blk = jax.lax.broadcasted_iota(
                    jnp.int32, (1, g, 1), 1)
                desc = ((blk >> (k - sub - 1)) & 1) == 1
                swap = jnp.where(desc, da < db, da > db)
            nda = jnp.where(swap, db, da)
            ndb = jnp.where(swap, da, db)
            nva = jnp.where(swap, vb, va)
            nvb = jnp.where(swap, va, vb)
            d = jnp.stack([nda, ndb], axis=2).reshape(R, L)
            v = jnp.stack([nva, nvb], axis=2).reshape(R, L)
    return d, v


def _combine_runs(jnp, d, v, log2_run: int):
    """Inclusive segmented sum over adjacent equal-doc runs (runs are
    <= 2^log2_run long); the run's LAST position holds the total."""
    off = 1
    for _ in range(log2_run):
        same = d[:, off:] == d[:, :-off]
        v = jnp.concatenate(
            [v[:, :off], v[:, off:] + jnp.where(same, v[:, :-off], 0.0)],
            axis=1)
        off *= 2
    return v


def pad_strip_pow2(jnp, d, v, sent):
    """Pad [B, L] strips to pow-2 length with (sent, 0) pairs. ``sent``
    may be traced (it's the per-segment dead doc slot = n1-1, the
    largest doc id — pads sort to the tail; the ok-mask drops them
    because their combined value stays 0)."""
    B, L = d.shape
    L2 = 1 << max((L - 1).bit_length(), 0) if L > 1 else 1
    if L2 == L:
        return d, v
    pad_d = jnp.broadcast_to(
        jnp.asarray(sent, dtype=d.dtype), (B, L2 - L))
    pad_v = jnp.zeros((B, L2 - L), dtype=v.dtype)
    return (jnp.concatenate([d, pad_d], axis=1),
            jnp.concatenate([v, pad_v], axis=1))


def make_xla_bitonic_core():
    """sort_core with the sort HLO swapped for the jnp bitonic network
    (everything else identical to ops/sparse.py::sort_core)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("k", "log2_run"))
    def core(d, v, sent, *, k: int, log2_run: int = 3):
        B = d.shape[0]
        d, v = pad_strip_pow2(jnp, d, v, sent)
        d2, v2 = bitonic_sort_pairs(jax, jnp, d, v)
        v2 = _combine_runs(jnp, d2, v2, log2_run)
        run_end = jnp.concatenate(
            [d2[:, 1:] != d2[:, :-1], jnp.ones((B, 1), dtype=bool)],
            axis=1)
        okm = run_end & (d2 != sent) & (v2 > 0.0)
        score = jnp.where(okm, v2, -jnp.inf)
        ts, tp = jax.lax.top_k(score, k)
        td = jnp.take_along_axis(d2, tp, axis=1)
        return ts, td

    return core


def _strip_kernel(sent_ref, d_ref, v_ref, ts_ref, td_ref, *maybe_tc,
                  k: int, log2_run: int):
    import jax
    import jax.numpy as jnp

    d = d_ref[:]
    v = v_ref[:]
    R, L = d.shape
    sent = sent_ref[0, 0]
    d, v = bitonic_sort_pairs(jax, jnp, d, v)
    v = _combine_runs(jnp, d, v, log2_run)
    run_end = jnp.concatenate(
        [d[:, 1:] != d[:, :-1], jnp.ones((R, 1), dtype=bool)], axis=1)
    okm = run_end & (d != sent) & (v > 0.0)
    if maybe_tc:
        (tc_ref,) = maybe_tc
        tc_ref[:] = jnp.broadcast_to(
            jnp.sum(okm, axis=1, dtype=jnp.int32)[:, None], (R, K_PAD))
    score = jnp.where(okm, v, -jnp.inf)
    # iterative k-extract in VMEM (argmax returns the FIRST max —
    # positions are doc-ascending, so ties break doc-asc like top_k)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, K_PAD), 1)

    def take_max(i, carry):
        sc, out_s, out_d = carry
        mx = jnp.max(sc, axis=1)
        arg = jnp.argmax(sc, axis=1).astype(jnp.int32)
        dd = jnp.take_along_axis(d, arg[:, None], axis=1)
        out_s = jnp.where(lane == i, mx[:, None], out_s)
        out_d = jnp.where(lane == i, dd, out_d)
        sc = jnp.where(col == arg[:, None], -jnp.inf, sc)
        return sc, out_s, out_d

    init = (score,
            jnp.full((R, K_PAD), -jnp.inf, dtype=jnp.float32),
            jnp.zeros((R, K_PAD), dtype=jnp.int32))
    _, out_s, out_d = jax.lax.fori_loop(0, k, take_max, init)
    ts_ref[:] = out_s
    td_ref[:] = out_d


def pallas_strip_topk(jax, jnp, d, v, sent, *, k: int, log2_run: int,
                      with_counts: bool = False,
                      rows_per_block: int = 8,
                      interpret: bool = False):
    """Fused VMEM strip core, callable from inside another jit: one
    grid step sorts/combines/extracts a ``[RB, L]`` row block without
    round-tripping intermediates through HBM. Returns
    (ts [B,k] f32, td [B,k] i32[, counts [B] i32])."""
    from jax.experimental import pallas as pl

    d, v = pad_strip_pow2(jnp, d, v, sent)
    B, L = d.shape
    RB = rows_per_block
    while B % RB:
        RB //= 2
    grid = (B // RB,)
    sent_arr = jnp.asarray(sent, dtype=jnp.int32).reshape(1, 1)
    out_specs = [
        pl.BlockSpec((RB, K_PAD), lambda i: (i, 0)),
        pl.BlockSpec((RB, K_PAD), lambda i: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, K_PAD), jnp.float32),
        jax.ShapeDtypeStruct((B, K_PAD), jnp.int32),
    ]
    if with_counts:
        out_specs.append(pl.BlockSpec((RB, K_PAD), lambda i: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, K_PAD), jnp.int32))
    outs = pl.pallas_call(
        partial(_strip_kernel, k=k, log2_run=log2_run),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((RB, L), lambda i: (i, 0)),
            pl.BlockSpec((RB, L), lambda i: (i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(sent_arr, d, v)
    if with_counts:
        return outs[0][:, :k], outs[1][:, :k], outs[2][:, 0]
    return outs[0][:, :k], outs[1][:, :k]


def make_pallas_strip_core(rows_per_block: int = 8,
                           interpret: bool = False):
    """Standalone jit wrapper over pallas_strip_topk (the A/B probe's
    entry point). Returns core(d, v, sent, k=, log2_run=) ->
    (ts [B,k] f32, td [B,k] i32)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("k", "log2_run"))
    def core(d, v, sent, *, k: int, log2_run: int = 3):
        return pallas_strip_topk(
            jax, jnp, d, v, sent, k=k, log2_run=log2_run,
            rows_per_block=rows_per_block, interpret=interpret)

    return core
