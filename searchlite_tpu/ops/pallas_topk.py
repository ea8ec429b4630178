"""Pallas TPU kernel: fused scoring matmul + per-chunk top-k.

The XLA path materializes the full score matrix ``[Q, n_docs]`` in HBM
(`W @ M` then ``lax.top_k``), costing a full write + re-read of Q·N
floats. This kernel fuses the two: each grid step multiplies a query
tile against one doc chunk of M on the MXU and immediately reduces the
chunk to its top-``KC`` candidates in VMEM, so only ``[Q, n_chunks·KC]``
candidates ever reach HBM — an O(N/KC) HBM-traffic reduction for the
top-k stage. A final (tiny) ``lax.top_k`` merges chunk candidates.

Exactness: per-chunk top-KC with KC ≥ k preserves the global top-k (the
global top-k docs of any chunk are within that chunk's top-KC), and the
merge keeps (score desc, doc asc) order: candidates are emitted
doc-ascending per chunk and chunks are scanned in order.

Grid: ``(q_tiles, chunks)``; block shapes: W tile ``[QT, S]``, M chunk
``[S, C]``, outputs ``[QT, KC]`` per cell.
"""

from __future__ import annotations

from functools import partial

import numpy as np

QT = 128     # query tile rows
C = 512      # doc chunk columns
KC = 16      # candidates kept per (query, chunk)
KC_PAD = 128  # output lane padding (Mosaic wants 128-divisible lanes)


def _kernel(w_ref, m_ref, valid_ref, scores_out, ids_out):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    chunk_idx = pl.program_id(1)
    scores = jnp.dot(w_ref[:], m_ref[:],
                     preferred_element_type=jnp.float32)   # [QT, C]
    valid = valid_ref[:] > 0                               # [1, C]
    scores = jnp.where(valid & (scores > 0.0), scores, -jnp.inf)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (QT, C), 1)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (QT, KC_PAD), 1)
    base = chunk_idx * C

    def take_max(i, carry):
        scores_c, out_s, out_i = carry
        mx = jnp.max(scores_c, axis=1)                      # [QT]
        # lowest doc id among ties: first argmax
        arg = jnp.argmax(scores_c, axis=1).astype(jnp.int32)
        # lane-select writes (dynamic_update_slice doesn't lower in Mosaic)
        out_s = jnp.where(lane_ids == i, mx[:, None], out_s)
        out_i = jnp.where(lane_ids == i, (arg + base)[:, None], out_i)
        scores_c = jnp.where(col_ids == arg[:, None], -jnp.inf, scores_c)
        return scores_c, out_s, out_i

    init = (scores,
            jnp.full((QT, KC_PAD), -jnp.inf, dtype=jnp.float32),
            jnp.zeros((QT, KC_PAD), dtype=jnp.int32))
    _, out_s, out_i = jax.lax.fori_loop(0, KC, take_max, init)
    scores_out[:] = out_s
    ids_out[:] = out_i


def make_fused_topk(interpret: bool = False):
    """Returns fused_topk(w [Q,S], m [S,N], valid [N] f32, k) →
    (scores [Q,k], ids [Q,k]). Q % QT == 0 and N % C == 0 required
    (callers pad; padded docs must have valid=0)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    @partial(jax.jit, static_argnames=("k",))
    def fused_topk(w, m, valid, *, k: int):
        q, s = w.shape
        n = m.shape[1]
        assert q % QT == 0 and n % C == 0
        n_chunks = n // C
        grid = (q // QT, n_chunks)
        valid2d = valid.reshape(1, n)
        scores, ids = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((QT, s), lambda qi, ci: (qi, 0)),
                pl.BlockSpec((s, C), lambda qi, ci: (0, ci)),
                pl.BlockSpec((1, C), lambda qi, ci: (0, ci)),
            ],
            out_specs=[
                pl.BlockSpec((QT, KC_PAD), lambda qi, ci: (qi, ci)),
                pl.BlockSpec((QT, KC_PAD), lambda qi, ci: (qi, ci)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((q, n_chunks * KC_PAD), jnp.float32),
                jax.ShapeDtypeStruct((q, n_chunks * KC_PAD), jnp.int32),
            ],
            interpret=interpret,
        )(w, m, valid2d)
        top_scores, pos = jax.lax.top_k(scores, k)
        top_ids = jnp.take_along_axis(ids, pos, axis=1)
        return top_scores, top_ids

    return fused_topk


def pad_for_fused(w: np.ndarray, n: int):
    """Pad Q to a QT multiple and N to a C multiple."""
    q = w.shape[0]
    q_pad = -(-q // QT) * QT
    n_pad = -(-n // C) * C
    return q_pad, n_pad
