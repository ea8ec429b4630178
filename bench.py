"""Benchmark: batched BM25 top-10 QPS on the device block-scoring kernel.

Measures the engine's flagship path (the dense replacement for the
reference's WAND loop, `query/wand.rs:659-903`): a Zipf-distributed
synthetic corpus in the HBM block layout, batches of multi-term queries
scored in one launch each, exact top-10.

Prints ONE JSON line:
    {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...}

vs_baseline is measured against a single-thread numpy CPU implementation
of the same exact scoring (a stand-in for the reference's single-node
CPU engine until the Rust baseline is run on identical hardware).
"""

from __future__ import annotations

import json
import time

import numpy as np

N_DOCS = 100_000
VOCAB = 10_000
AVG_LEN = 80
BATCH = 256
TERMS_PER_QUERY = 4
K = 10
MAX_BLOCKS = 64
BLOCK = 128


def build_corpus(seed=7):
    rng = np.random.default_rng(seed)
    # Zipf-ish document frequencies, capped
    ranks = np.arange(1, VOCAB + 1)
    dfs = np.minimum((N_DOCS * 2.0 / ranks).astype(np.int64), N_DOCS // 2)
    dfs = np.maximum(dfs, 2)
    total_blocks = int(np.sum(-(-dfs // BLOCK)))
    block_docs = np.full((total_blocks, BLOCK), N_DOCS, dtype=np.int32)
    block_tfs = np.zeros((total_blocks, BLOCK), dtype=np.float32)
    term_start = np.zeros(VOCAB, dtype=np.int32)
    term_count = np.zeros(VOCAB, dtype=np.int32)
    term_df = dfs.astype(np.int64)
    cursor = 0
    for t in range(VOCAB):
        df = int(dfs[t])
        # sorted distinct doc ids without a full permutation
        docs = np.unique(rng.integers(0, N_DOCS, size=int(df * 1.2)))[:df]
        df = len(docs)
        term_df[t] = df
        tfs = rng.integers(1, 6, size=df).astype(np.float32)
        nb = -(-df // BLOCK)
        flat_d = block_docs[cursor:cursor + nb].reshape(-1)
        flat_t = block_tfs[cursor:cursor + nb].reshape(-1)
        flat_d[:df] = docs
        flat_t[:df] = tfs
        term_start[t] = cursor
        term_count[t] = nb
        cursor += nb
    doc_len = np.zeros((1, N_DOCS + 1), dtype=np.float32)
    doc_len[0, :N_DOCS] = rng.integers(
        AVG_LEN // 2, AVG_LEN * 2, size=N_DOCS)
    avgdl = np.asarray([doc_len[0, :N_DOCS].mean()], dtype=np.float32)
    deleted = np.zeros(N_DOCS + 1, dtype=bool)
    deleted[N_DOCS] = True
    return {
        "block_docs": block_docs[:cursor],
        "block_tfs": block_tfs[:cursor],
        "term_start": term_start,
        "term_count": term_count,
        "term_df": term_df,
        "doc_len": doc_len,
        "avgdl": avgdl,
        "deleted": deleted,
    }


def build_queries(idx, n_batches, seed=11):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        starts = np.zeros((BATCH, TERMS_PER_QUERY * 4), dtype=np.int32)
        counts = np.zeros_like(starts)
        weights = np.zeros(starts.shape, dtype=np.float32)
        fields = np.zeros_like(starts)
        valid = np.zeros(starts.shape, dtype=bool)
        for q in range(BATCH):
            # skew away from the absolute top terms a bit (realistic
            # queries rarely consist purely of stopwords)
            terms = rng.integers(10, VOCAB, size=TERMS_PER_QUERY)
            slot = 0
            for t in terms:
                df = float(idx["term_df"][t])
                idf = max(np.log((N_DOCS - df + 0.5) / (df + 0.5)), 0.0) + 1.0
                start = int(idx["term_start"][t])
                count = int(idx["term_count"][t])
                while count > 0 and slot < starts.shape[1]:
                    take = min(count, MAX_BLOCKS)
                    starts[q, slot] = start
                    counts[q, slot] = take
                    weights[q, slot] = idf
                    valid[q, slot] = True
                    start += take
                    count -= take
                    slot += 1
        batches.append((starts, counts, weights, fields, valid))
    return batches


def cpu_reference_qps(idx, batch, n_queries=8):
    """Single-thread numpy exact scoring, timed per query."""
    starts, counts, weights, _fields, valid = batch
    k1, b = 0.9, 0.4
    doc_len = idx["doc_len"][0, :N_DOCS]
    avg = float(idx["avgdl"][0])
    t0 = time.perf_counter()
    for q in range(n_queries):
        scores = np.zeros(N_DOCS + 1, dtype=np.float32)
        for s in range(starts.shape[1]):
            if not valid[q, s]:
                continue
            blk0, nb, w = int(starts[q, s]), int(counts[q, s]), \
                float(weights[q, s])
            docs = idx["block_docs"][blk0:blk0 + nb].reshape(-1)
            tfs = idx["block_tfs"][blk0:blk0 + nb].reshape(-1)
            ok = docs < N_DOCS
            docs = docs[ok]
            tfs = tfs[ok]
            norm = doc_len[docs] / avg
            denom = np.maximum(tfs + k1 * (1 - b + b * norm), 1e-6)
            np.add.at(scores, docs, w * tfs * (k1 + 1) / denom)
        top = np.argpartition(-scores[:N_DOCS], K)[:K]
        _ = top
    dt = time.perf_counter() - t0
    return n_queries / dt


def main():
    import jax
    import jax.numpy as jnp

    from searchlite_tpu.ops.batch import make_batched_scorer

    idx = build_corpus()
    batches = build_queries(idx, n_batches=6)
    scorer = make_batched_scorer(MAX_BLOCKS)

    dev = {
        "block_docs": jnp.asarray(idx["block_docs"]),
        "block_tfs": jnp.asarray(idx["block_tfs"]),
        "doc_len": jnp.asarray(idx["doc_len"]),
        "avgdl": jnp.asarray(idx["avgdl"]),
        "deleted": jnp.asarray(idx["deleted"]),
    }

    def run(batch):
        starts, counts, weights, fields, valid = batch
        return scorer(dev["block_docs"], dev["block_tfs"], dev["doc_len"],
                      dev["avgdl"], dev["deleted"],
                      jnp.asarray(starts), jnp.asarray(counts),
                      jnp.asarray(weights), jnp.asarray(fields),
                      jnp.asarray(valid),
                      jnp.float32(0.9), jnp.float32(0.4), k=K)

    # warmup/compile
    out = run(batches[0])
    out[0].block_until_ready()

    t0 = time.perf_counter()
    n_queries = 0
    for batch in batches[1:]:
        scores, ids = run(batch)
        n_queries += BATCH
    scores.block_until_ready()
    dt = time.perf_counter() - t0
    qps = n_queries / dt

    cpu_qps = cpu_reference_qps(idx, batches[0])

    print(json.dumps({
        "metric": f"batched_bm25_top{K}_qps_{N_DOCS//1000}k_docs",
        "value": round(qps, 2),
        "unit": "qps",
        "vs_baseline": round(qps / cpu_qps, 2),
    }))


if __name__ == "__main__":
    main()
