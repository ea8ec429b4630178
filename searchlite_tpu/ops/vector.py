"""Exact vector similarity on the MXU.

Replaces the reference's single-layer HNSW graph (`vectors/hnsw.rs`) —
a pointer-chasing beam search that maps badly to TPUs — with exact
brute-force similarity: one ``[n_docs, dim] @ [dim, n_queries]`` matmul
on the MXU plus on-device top-k. Exact search strictly dominates the
ANN graph on recall and is faster on this hardware for corpus sizes the
reference targets; it also realizes the reference's stubbed ``gpu``
rerank path (`gpu/rerank.rs:1-6`).

Metric semantics parity (`vectors/mod.rs:83-129`):
- cosine: dot product over ingest-normalized vectors
- l2: negated euclidean distance (higher is better)
Missing vectors never match (the caller blends the missing penalty).
"""

from __future__ import annotations

from functools import partial

import numpy as np


def make_vector_topk():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("k", "metric"))
    def run(vectors, present, mask, queries, *, k: int, metric: str):
        """vectors [N, D]; present/mask [N]; queries [Q, D] →
        (scores [Q, k], ids [Q, k])."""
        if metric == "cosine":
            sims = jnp.dot(queries, vectors.T,
                           preferred_element_type=jnp.float32)
        else:
            # -||v - q|| expanded via the MXU-friendly identity
            v_sq = jnp.sum(vectors * vectors, axis=1)[None, :]
            q_sq = jnp.sum(queries * queries, axis=1)[:, None]
            dots = jnp.dot(queries, vectors.T,
                           preferred_element_type=jnp.float32)
            sims = -jnp.sqrt(jnp.maximum(v_sq + q_sq - 2.0 * dots, 0.0))
        ok = (present & mask)[None, :]
        masked = jnp.where(ok, sims, -jnp.inf)
        return jax.lax.top_k(masked, k)

    return run


_TOPK = None


def vector_topk(vectors: np.ndarray, present: np.ndarray, mask: np.ndarray,
                queries: np.ndarray, k: int, metric: str):
    global _TOPK
    import jax.numpy as jnp

    if _TOPK is None:
        _TOPK = make_vector_topk()
    k = min(k, vectors.shape[0]) if vectors.shape[0] else 0
    if k == 0 or vectors.shape[0] == 0:
        q = queries.shape[0]
        return (np.zeros((q, 0), dtype=np.float32),
                np.zeros((q, 0), dtype=np.int64))
    scores, ids = _TOPK(
        jnp.asarray(vectors), jnp.asarray(present), jnp.asarray(mask),
        jnp.asarray(queries), k=k, metric=metric)
    return np.asarray(scores), np.asarray(ids)
