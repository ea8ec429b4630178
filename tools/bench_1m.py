"""1M-doc batched QPS through the engine (doc-sharded path)."""

import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402

bench.N_DOCS = 1_000_000
bench.VOCAB = 50_000
bench.N_BATCHES = 2


def main():
    from searchlite_tpu.api.types import IndexOptions, StorageType
    from searchlite_tpu.index import Index
    from searchlite_tpu.index.manifest import Schema

    t0 = time.perf_counter()
    docs = bench.build_docs()
    print(f"gen {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    index = Index.create(
        IndexOptions(path="", create_if_missing=True,
                     storage=StorageType.IN_MEMORY),
        Schema.from_json({
            "text_fields": [{"name": "body", "analyzer": "default",
                             "stored": False, "indexed": True}]}))
    writer = index.writer()
    writer.add_documents(docs)
    writer.commit()
    print(f"ingest {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    reader = index.reader()
    batches = bench.build_queries()
    for batch in batches:
        reader.search_batch(batch, limit=bench.K)
    print(f"upload+warm {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    n = 0
    for _rep in range(3):
        for batch in batches[1:]:
            reader.search_batch(batch, limit=bench.K)
            n += len(batch)
    dt = time.perf_counter() - t0
    print(f"1M-doc batched QPS: {n/dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
