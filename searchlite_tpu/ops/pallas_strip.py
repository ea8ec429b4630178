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

Everything in the kernel is written in the Mosaic-lowerable subset:
the XOR-partner exchange of each bitonic stage is two lane-rolls + a
parity select (NO 4-D reshapes — Mosaic rejects relayouts below the
(8, 128) tile), the segmented run-combine is a roll + lane-iota mask
(no unaligned lane slices), and the k-extract uses max / masked-min
reductions instead of argmax + take_along_axis (no lane gathers). The
first device attempt used reshape(R, g, 2, s) networks and died in
Mosaic with a bare AssertionError — this is the rewrite.

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
_I32_MAX = 2**31 - 1


def bitonic_sort_pairs(jax, jnp, d, v, roll=None):
    """Ascending bitonic sort of ``d`` [R, L] (int32 keys) along axis 1
    with ``v`` co-permuted. L must be a power of two. Unstable — the
    strip contract only needs equal docs adjacent (run sums are
    order-free).

    Stage (merge size ``m``, distance ``j``) pairs lane ``i`` with
    ``i ^ j``; because ``j`` is a power of two the pair partner is
    ``roll(x, -j)`` on lanes whose ``j`` bit is clear and
    ``roll(x, +j)`` on lanes whose ``j`` bit is set (the cyclic wrap
    never lands on a selected lane). ``roll`` defaults to ``jnp.roll``
    (XLA path); the Pallas kernel passes the Mosaic roll primitive.
    """
    if roll is None:
        roll = lambda x, s: jnp.roll(x, s, axis=1)  # noqa: E731
    R, L = d.shape
    n = L.bit_length() - 1
    assert (1 << n) == L, "strip length must be a power of two"
    col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    for km in range(1, n + 1):
        m = 1 << km  # bitonic merge size
        for sub in range(km - 1, -1, -1):
            j = 1 << sub
            is_lower = (col & j) == 0
            pd = jnp.where(is_lower, roll(d, -j), roll(d, j))
            pv = jnp.where(is_lower, roll(v, -j), roll(v, j))
            # take the pair MIN on lanes where the merge-direction bit
            # (col's m bit; clear everywhere on the final merge, which
            # makes it globally ascending with no special case) equals
            # the pair-position bit. Expressed as i1 and/or only —
            # select with BOOLEAN branch operands makes Mosaic widen
            # them to i8 and die on the i8->i1 trunc at the use.
            take_min = (((col >> km) ^ (col >> sub)) & 1) == 0
            sel = ((take_min & (pd < d))
                   | (jnp.logical_not(take_min) & (pd > d)))
            d = jnp.where(sel, pd, d)
            v = jnp.where(sel, pv, v)
    return d, v


def _combine_runs(jax, jnp, d, v, log2_run: int, roll=None):
    """Inclusive segmented sum over adjacent equal-doc runs (runs are
    <= 2^log2_run long); the run's LAST position holds the total.
    Roll-based: lane ``i`` adds lane ``i - off`` when both hold the
    same doc (the first ``off`` lanes never add — iota mask, so the
    cyclic wrap contributes nothing)."""
    if roll is None:
        roll = lambda x, s: jnp.roll(x, s, axis=1)  # noqa: E731
    R, L = d.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    off = 1
    for _ in range(log2_run):
        same = (roll(d, off) == d) & (col >= off)
        v = v + jnp.where(same, roll(v, off), 0.0)
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
        v2 = _combine_runs(jax, jnp, d2, v2, log2_run)
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
                  k: int, log2_run: int, interpret: bool):
    import jax
    import jax.numpy as jnp

    if interpret:
        roll = lambda x, s: jnp.roll(x, s, axis=1)  # noqa: E731
    else:
        from jax.experimental.pallas import tpu as pltpu

        # pltpu.roll matches jnp.roll (positive = shift right) but
        # rejects negative shifts — cyclic-equivalent s % L is fine
        roll = lambda x, s: pltpu.roll(x, s % x.shape[1], 1)  # noqa: E731

    d = d_ref[:]
    v = v_ref[:]
    R, L = d.shape
    sent = sent_ref[0, 0]
    d, v = bitonic_sort_pairs(jax, jnp, d, v, roll=roll)
    v = _combine_runs(jax, jnp, d, v, log2_run, roll=roll)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    # run end: next lane holds a different doc (last lane is an end)
    run_end = (roll(d, -1) != d) | (col == L - 1)
    okm = run_end & (d != sent) & (v > 0.0)
    if maybe_tc:
        (tc_ref,) = maybe_tc
        tc_ref[:] = jnp.broadcast_to(
            jnp.sum(okm, axis=1, dtype=jnp.int32)[:, None], (R, K_PAD))
    score = jnp.where(okm, v, -jnp.inf)
    # iterative k-extract in VMEM, argmax-free: the max score's doc is
    # the masked MIN doc over maximal lanes (ties break doc-asc like
    # top_k, because each live doc occupies exactly one lane after the
    # run-combine mask)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, K_PAD), 1)

    def take_max(i, carry):
        sc, out_s, out_d = carry
        mx = jnp.max(sc, axis=1)[:, None]
        at_max = sc == mx
        dd = jnp.min(jnp.where(at_max, d, _I32_MAX), axis=1)[:, None]
        out_s = jnp.where(lane == i, mx, out_s)
        out_d = jnp.where(lane == i, dd, out_d)
        sc = jnp.where(at_max & (d == dd), -jnp.inf, sc)
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
    # Mosaic's scoped-vmem stack budget is 16M: at RB=8, L=16384 the
    # kernel's live set measured 20.07M on v5e (probe_pallas_strip), so
    # halve the row block once per doubling past 8192 lanes
    RB = rows_per_block
    while RB > 1 and RB * max(L, 1) > 8 * 8192:
        RB //= 2
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
        partial(_strip_kernel, k=k, log2_run=log2_run,
                interpret=interpret),
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
