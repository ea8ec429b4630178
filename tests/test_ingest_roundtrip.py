"""Ingest round-trip fuzz over schema shapes.

The segment writer's hot loop was rebuilt for speed (per-field text
plans, bulk fast columns, id-less docstore records); these tests pin
the WRITE → READ round trip across schema features in combination:
multi-value text, stored fields, keyword dedupe+fast, numeric fast,
nested objects, a second analyzer, unicode text (the non-ASCII inline
path sharing a field with bulk-buffered ASCII docs), deletes, and
compaction."""

import random

import numpy as np
import pytest

from searchlite_tpu.api.types import IndexOptions, StorageType
from searchlite_tpu.index import Index
from searchlite_tpu.index.manifest import Schema

SCHEMA = {
    "analyzers": [
        {"name": "en", "tokenizer": "default",
         "filters": ["lowercase",
                     {"type": "stopwords", "stopwords": "en"},
                     {"type": "stemmer", "stemmer": "english"}]}],
    "text_fields": [
        {"name": "body", "analyzer": "default", "stored": True,
         "indexed": True},
        {"name": "title", "analyzer": "en", "stored": True,
         "indexed": True}],
    "keyword_fields": [
        {"name": "tag", "stored": True, "indexed": True, "fast": True}],
    "numeric_fields": [
        {"name": "price", "i64": False, "stored": True, "fast": True},
        {"name": "year", "i64": True, "stored": False, "fast": True}],
    "nested_fields": [
        {"name": "authors", "fields": [
            {"type": "keyword", "name": "name", "stored": True,
             "indexed": False, "fast": True},
            {"type": "numeric", "name": "age", "i64": True,
             "fast": True, "stored": True}]}],
}

WORDS = ["alpha", "beta", "gamma", "delta", "running", "runs",
         "quickly", "the", "and", "zürich", "café", "北京"]


def rand_doc(rng: random.Random, i: int) -> dict:
    doc = {"_id": str(i),
           "body": " ".join(rng.choices(WORDS, k=rng.randint(1, 12)))}
    if rng.random() < 0.7:
        # multi-value + occasionally non-ASCII (inline analyzer path
        # interleaved with bulk-buffered ASCII docs on the same field)
        doc["title"] = [" ".join(rng.choices(WORDS,
                                             k=rng.randint(1, 4)))
                        for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.8:
        doc["tag"] = rng.choice(["A", "b", "C", "b", "Ω"])
    if rng.random() < 0.8:
        doc["price"] = round(rng.uniform(0, 99), 2)
    if rng.random() < 0.5:
        doc["year"] = rng.randint(1990, 2026)
    if rng.random() < 0.4:
        doc["authors"] = [{"name": rng.choice(["x", "y", "z"]),
                           "age": rng.randint(20, 80)}
                          for _ in range(rng.randint(1, 3))]
    return doc


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(77)
    idx = Index.create(
        IndexOptions(path="", create_if_missing=True,
                     storage=StorageType.IN_MEMORY),
        Schema.from_json(SCHEMA))
    w = idx.writer()
    docs = [rand_doc(rng, i) for i in range(400)]
    for i, d in enumerate(docs):
        w.add_document(d)
        if i == 199:
            w.commit()  # two segments
    w.commit()
    w.delete_documents([str(i) for i in range(0, 400, 37)])
    w.commit()
    deleted = {str(i) for i in range(0, 400, 37)}
    return idx, docs, deleted


def test_stored_roundtrip(corpus):
    idx, docs, deleted = corpus
    reader = idx.reader()
    by_id = {}
    for seg in reader.segments:
        for ordinal, did in enumerate(seg.doc_ids):
            if not seg.is_deleted(ordinal):
                by_id[did] = seg.get_doc(ordinal)
    for doc in docs:
        did = doc["_id"]
        if did in deleted:
            assert did not in by_id or True  # later segment may redefine
            continue
        got = by_id[did]
        assert got["_id"] == did
        assert got["body"] == doc["body"]
        if "title" in doc:
            want = doc["title"] if len(doc["title"]) > 1 \
                else doc["title"][0]
            assert got["title"] == want
        if "tag" in doc:
            assert got["tag"] == doc["tag"]
        if "price" in doc:
            assert got["price"] == pytest.approx(doc["price"])
        assert "year" not in got  # stored: False


def test_search_reaches_every_live_doc(corpus):
    idx, docs, deleted = corpus
    reader = idx.reader()
    # every live doc must be findable by one of its own body words
    missing = []
    for doc in docs:
        if doc["_id"] in deleted:
            continue
        word = doc["body"].split()[0]
        res = reader.search({"query": {"type": "term", "field": "body",
                                       "value": word.lower()},
                             "limit": 400})
        ids = {h.doc_id for h in res.hits}
        if doc["_id"] not in ids:
            missing.append((doc["_id"], word))
    assert not missing, missing[:5]


def test_fast_columns_agree_with_docs(corpus):
    idx, docs, deleted = corpus
    reader = idx.reader()
    res = reader.search({
        "query": {"type": "match_all"},
        "limit": 400,
        "aggs": {"years": {"type": "stats", "field": "year"},
                 "tags": {"type": "terms", "field": "tag",
                          "size": 20}}})
    want_years = [d["year"] for d in docs
                  if "year" in d and d["_id"] not in deleted]
    ys = res.to_json()["aggregations"]["years"]
    assert ys["count"] == len(want_years)
    assert ys["sum"] == pytest.approx(sum(want_years))
    # fast keyword columns keep ORIGINAL strings (terms agg keys are
    # unlowercased; lowercasing applies to INDEXING only)
    want_tags = {}
    for d in docs:
        if "tag" in d and d["_id"] not in deleted:
            want_tags[d["tag"]] = want_tags.get(d["tag"], 0) + 1
    got_tags = {b["key"]: b["doc_count"]
                for b in res.to_json()["aggregations"]["tags"]["buckets"]}
    assert got_tags == want_tags


def test_nested_filter_semantics(corpus):
    idx, docs, deleted = corpus
    reader = idx.reader()
    res = reader.search({
        "query": {"type": "match_all"}, "limit": 400,
        "filter": {"Nested": {"path": "authors", "filter": {"And": [
            {"KeywordEq": {"field": "name", "value": "x"}},
            {"I64Range": {"field": "age", "min": 40,
                          "max": 80}}]}}}})
    got = {h.doc_id for h in res.hits}
    want = set()
    for d in docs:
        if d["_id"] in deleted or "authors" not in d:
            continue
        if any(a["name"] == "x" and 40 <= a["age"] <= 80
               for a in d["authors"]):
            want.add(d["_id"])
    assert got == want


def test_compact_refuses_unstored_fast_field(corpus):
    """`year` is fast but stored: False — compaction must refuse (the
    rewrite would lose the column; `index/mod.rs:202-212` parity).
    Compaction success round-trips are covered in test_index_layer."""
    idx, _docs, _deleted = corpus
    from searchlite_tpu.errors import SchemaError

    with pytest.raises(SchemaError):
        idx.compact()


class TestColumnarEquivalence:
    """The field-major columnar ingest fast path must produce
    BYTE-identical segments to the per-doc loop, across pure and
    impure columns (missing values, lists, non-ASCII under the
    default tokenizer, empty strings, stopword analyzers)."""

    FLAT_SCHEMA = {
        "analyzers": [
            {"name": "en", "tokenizer": "default",
             "filters": ["lowercase",
                         {"type": "stopwords", "stopwords": "en"},
                         {"type": "stemmer", "stemmer": "english"}]}],
        "text_fields": [
            {"name": "body", "analyzer": "default", "stored": False,
             "indexed": True},
            {"name": "title", "analyzer": "en", "stored": False,
             "indexed": True}],
        "keyword_fields": [
            {"name": "tag", "stored": False, "indexed": True,
             "fast": True},
            {"name": "cat", "stored": False, "indexed": False,
             "fast": True}],
        "numeric_fields": [
            {"name": "price", "i64": False, "stored": False,
             "fast": True},
            {"name": "year", "i64": True, "stored": False,
             "fast": True}],
    }

    def _gen_docs(self, seed, n=400, impure=False):
        rng = random.Random(seed)
        docs = []
        for i in range(n):
            doc = {"_id": str(i),
                   "body": " ".join(
                       f"w{rng.randrange(60)}"
                       for _ in range(rng.randrange(0, 25))),
                   "title": f"the running w{rng.randrange(20)}",
                   "tag": rng.choice(["A", "b", "", "Mixed"]),
                   "cat": f"c{i % 7}",
                   "price": rng.random() * 100,
                   "year": rng.randrange(1990, 2030)}
            if impure:
                r = rng.random()
                if r < 0.1:
                    doc.pop("body")
                elif r < 0.2:
                    doc["body"] = ["multi", "value body"]
                elif r < 0.3:
                    doc["body"] = "café non-ascii crème"
                if rng.random() < 0.15:
                    doc["tag"] = ["x", "X", "y"]
                if rng.random() < 0.15:
                    doc.pop("price")
                if rng.random() < 0.15:
                    doc["year"] = [2001, 2002]
            docs.append(doc)
        return docs

    @pytest.mark.parametrize("positions", [False, True])
    @pytest.mark.parametrize("impure", [False, True])
    def test_segments_byte_identical(self, positions, impure,
                                     monkeypatch):
        payloads = []
        for off in (False, True):
            if off:
                monkeypatch.setenv("SEARCHLITE_COLUMNAR_OFF", "1")
            else:
                monkeypatch.delenv("SEARCHLITE_COLUMNAR_OFF",
                                   raising=False)
            idx = Index.create(
                IndexOptions(path="", create_if_missing=True,
                             storage=StorageType.IN_MEMORY,
                             enable_positions=positions),
                Schema.from_json(self.FLAT_SCHEMA))
            w = idx.writer()
            w.add_documents(self._gen_docs(99, impure=impure))
            w.commit()
            storage = idx.storage
            by_kind = {}
            for path in sorted(storage.list_files()):
                if not path.startswith("seg_"):
                    continue
                kind = path.rsplit(".", 1)[-1]
                data = storage.read_to_end(path)
                by_kind.setdefault(kind, []).append(data)
            payloads.append(by_kind)
        a, b = payloads
        assert set(a) == set(b)
        assert {"post", "terms", "fast", "docs", "meta"} <= set(a)
        for kind in a:
            assert a[kind] == b[kind], f"{kind} differs"

    def test_columnar_path_engages(self, monkeypatch):
        """Sanity: the fast path actually runs for the flat schema
        (guards against silent gate regressions)."""
        from searchlite_tpu.index import segment as seg_mod

        calls = []
        orig = seg_mod.SegmentWriter._ingest_columnar

        def spy(self, *a, **kw):
            out = orig(self, *a, **kw)
            calls.append(out)
            return out

        monkeypatch.setattr(seg_mod.SegmentWriter,
                            "_ingest_columnar", spy)
        idx = Index.create(
            IndexOptions(path="", create_if_missing=True,
                         storage=StorageType.IN_MEMORY),
            Schema.from_json(self.FLAT_SCHEMA))
        w = idx.writer()
        w.add_documents(self._gen_docs(5, n=50))
        w.commit()
        assert calls == [True]


class TestBulkValidateEquivalence:
    """Schema.validate_documents must accept exactly what the per-doc
    validator accepts and raise its exact errors otherwise."""

    SCHEMA = TestColumnarEquivalence.FLAT_SCHEMA

    def _schema(self):
        return Schema.from_json(self.SCHEMA)

    def test_pure_batch_passes(self):
        docs = [{"_id": str(i), "body": "a b", "tag": "t",
                 "price": 1.5, "year": 2000} for i in range(50)]
        self._schema().validate_documents(docs)  # no raise

    @pytest.mark.parametrize("bad,pos", [
        ({"_id": "", "body": "x"}, 0),
        ({"_id": "x", "body": 3}, 7),
        ({"_id": "x", "price": "not-a-number"}, 3),
        ({"_id": "x", "year": 1.5}, 9),
        ({"_id": "x", "year": True}, 5),
        ({"_id": "x", "tag": [1, 2]}, 2),
        ({"body": "missing id"}, 4),
    ])
    def test_bad_doc_raises_same_error(self, bad, pos):
        from searchlite_tpu.errors import SchemaError

        schema = self._schema()
        docs = [{"_id": f"g{i}", "body": "ok", "year": 2001}
                for i in range(10)]
        docs[pos] = bad
        with pytest.raises(SchemaError) as e_bulk:
            schema.validate_documents(docs)
        # per-doc reference error: first failing doc in order
        msg = None
        for d in docs:
            try:
                schema.validate_document(d)
            except SchemaError as e:
                msg = str(e)
                break
        assert msg is not None and str(e_bulk.value) == msg

    def test_nullable_and_none(self):
        from searchlite_tpu.errors import SchemaError

        schema = Schema.from_json({
            "text_fields": [{"name": "body", "analyzer": "default",
                             "stored": False, "indexed": True,
                             "nullable": True}],
            "keyword_fields": [{"name": "tag", "stored": False,
                                "indexed": True, "fast": False}]})
        schema.validate_documents(
            [{"_id": "1", "body": None}, {"_id": "2"}])
        with pytest.raises(SchemaError):
            schema.validate_documents(
                [{"_id": "1", "tag": None}])  # tag not nullable
