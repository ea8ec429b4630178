"""Batched multi-query BM25 scoring + top-k.

Query batching is the data-parallel axis of the engine (BASELINE.json
north star): one launch scores a whole batch of queries against the
HBM-resident postings blocks, amortizing dispatch and keeping the VPU
fed. This is the kernel behind the MS MARCO batched-QPS benchmark and
the building block the multi-chip path shards (see parallel/mesh.py).

Shapes:
    block_docs [B,128] int32 (sentinel-padded), block_tfs [B,128] f32
    doc_len [F, N1] f32, avgdl [F] f32
    q_idx/q_weight/q_field/q_valid: [Q, T] — per query, T term slots
        (q_weight = idf * boost, pre-folded host-side)
    term_block_start/count let each term's ragged block range be walked
        with a fixed per-term block budget (max_blocks).

Returns (scores [Q, k], doc_ids [Q, k]) — exact top-k per query.
"""

from __future__ import annotations

from functools import partial

import numpy as np


def make_batched_scorer(max_blocks_per_term: int):
    """Build a jitted batched scorer with a fixed per-term block budget.

    Terms with more than ``max_blocks_per_term`` blocks must be split
    into multiple term slots by the caller (host side pads/splits).
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("k",))
    def scorer(block_docs, block_tfs, doc_len, avgdl, deleted,
               q_block_start, q_block_count, q_weight, q_field, q_valid,
               k1, b, *, k: int):
        n1 = doc_len.shape[1]
        n_docs = n1 - 1

        def score_one(starts, counts, weights, fields, valid):
            # gather each term's blocks: [T, max_blocks, 128]
            offs = jnp.arange(max_blocks_per_term, dtype=jnp.int32)
            blk = starts[:, None] + offs[None, :]
            blk_ok = (offs[None, :] < counts[:, None]) & valid[:, None]
            blk = jnp.where(blk_ok, blk, 0)
            docs = block_docs[blk]          # [T, MB, 128]
            tfs = block_tfs[blk]
            ok = blk_ok[:, :, None] & (docs < n_docs)
            dl = doc_len[fields[:, None, None], docs]
            avg = avgdl[fields][:, None, None]
            norm = jnp.where(avg > 0, dl / jnp.where(avg > 0, avg, 1.0), 1.0)
            denom = jnp.maximum(tfs + k1 * (1.0 - b + b * norm), 1e-6)
            sc = weights[:, None, None] * tfs * (k1 + 1.0) / denom
            sc = jnp.where(ok, sc, 0.0)
            scores = jnp.zeros(n1, dtype=jnp.float32).at[
                docs.reshape(-1)].add(sc.reshape(-1))
            matched = jnp.zeros(n1, dtype=bool).at[
                docs.reshape(-1)].max(ok.reshape(-1))
            masked = jnp.where(matched & ~deleted, scores, -jnp.inf)
            return jax.lax.top_k(masked, k)

        return jax.vmap(score_one)(q_block_start, q_block_count, q_weight,
                                   q_field, q_valid)

    return scorer


def build_query_batch(seg, dseg, queries: list[list[tuple[str, str]]],
                      max_blocks_per_term: int, k1: float, b: float):
    """Host-side prep: queries as lists of (field, token) → padded arrays.

    Splits terms whose block range exceeds the budget into extra slots.
    """
    from searchlite_tpu.models.bm25 import idf as bm25_idf

    postings = seg.postings
    live = float(max(dseg.live_docs, 0))
    rows = []
    for query in queries:
        starts, counts, weights, fields = [], [], [], []
        for field, token in query:
            tid = seg.terms.get(f"{field}:{token}")
            if tid is None:
                continue
            df = float(postings.term_df[tid])
            w = bm25_idf(df, live)
            start = int(postings.term_block_start[tid])
            count = int(postings.term_block_count[tid])
            fid = dseg.field_id(field)
            while count > 0:
                take = min(count, max_blocks_per_term)
                starts.append(start)
                counts.append(take)
                weights.append(w)
                fields.append(fid)
                start += take
                count -= take
        rows.append((starts, counts, weights, fields))
    t_max = max((len(r[0]) for r in rows), default=1)
    t_max = max(t_max, 1)
    q = len(rows)
    out = {
        "q_block_start": np.zeros((q, t_max), dtype=np.int32),
        "q_block_count": np.zeros((q, t_max), dtype=np.int32),
        "q_weight": np.zeros((q, t_max), dtype=np.float32),
        "q_field": np.zeros((q, t_max), dtype=np.int32),
        "q_valid": np.zeros((q, t_max), dtype=bool),
    }
    for i, (starts, counts, weights, fields) in enumerate(rows):
        n = len(starts)
        out["q_block_start"][i, :n] = starts
        out["q_block_count"][i, :n] = counts
        out["q_weight"][i, :n] = weights
        out["q_field"][i, :n] = fields
        out["q_valid"][i, :n] = True
    return out
