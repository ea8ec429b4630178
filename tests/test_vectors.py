"""Vector + hybrid search tests (parity targets:
`searchlite-core/tests/vector_search.rs`)."""

import math

import numpy as np
import pytest

from searchlite_tpu.api.types import IndexOptions, StorageType
from searchlite_tpu.errors import QueryError
from searchlite_tpu.index import Index
from searchlite_tpu.index.manifest import Schema


def make_vector_index(metric="Cosine", docs=None):
    schema = Schema.from_json({
        "text_fields": [{"name": "body", "analyzer": "default",
                         "stored": True, "indexed": True}],
        "keyword_fields": [{"name": "tag", "stored": True, "indexed": True,
                            "fast": True}],
        "numeric_fields": [],
        "vector_fields": [{"name": "embedding", "dim": 4,
                           "metric": metric}],
    })
    index = Index.create(
        IndexOptions(path="", create_if_missing=True,
                     storage=StorageType.IN_MEMORY), schema)
    writer = index.writer()
    default_docs = [
        {"_id": "a", "body": "alpha document", "tag": "x",
         "embedding": [1.0, 0.0, 0.0, 0.0]},
        {"_id": "b", "body": "beta document", "tag": "x",
         "embedding": [0.9, 0.1, 0.0, 0.0]},
        {"_id": "c", "body": "gamma document", "tag": "y",
         "embedding": [0.0, 1.0, 0.0, 0.0]},
        {"_id": "d", "body": "delta document without vector", "tag": "y"},
    ]
    for doc in (docs if docs is not None else default_docs):
        writer.add_document(doc)
    writer.commit()
    return index


class TestVectorOnly:
    def test_cosine_ranking(self):
        index = make_vector_index()
        res = index.reader().search({
            "query": {"type": "vector", "field": "embedding",
                      "vector": [1.0, 0.0, 0.0, 0.0], "alpha": 0.0},
            "limit": 3})
        ids = [h.doc_id for h in res.hits]
        assert ids[0] == "a"
        assert ids[1] == "b"
        assert res.hits[0].score == pytest.approx(1.0, rel=1e-5)
        assert res.hits[0].vector_score is not None

    def test_l2_ranking(self):
        index = make_vector_index(metric="L2")
        res = index.reader().search({
            "query": {"type": "vector", "field": "embedding",
                      "vector": [0.9, 0.1, 0.0, 0.0], "alpha": 0.0},
            "limit": 3})
        assert [h.doc_id for h in res.hits][0] == "b"
        # L2 similarity is negated distance
        assert res.hits[0].score == pytest.approx(0.0, abs=1e-5)

    def test_missing_vector_doc_excluded(self):
        index = make_vector_index()
        res = index.reader().search({
            "query": {"type": "vector", "field": "embedding",
                      "vector": [1.0, 0.0, 0.0, 0.0], "alpha": 0.0},
            "limit": 10})
        assert "d" not in [h.doc_id for h in res.hits]

    def test_vector_filter(self):
        index = make_vector_index()
        res = index.reader().search({
            "query": {"type": "vector", "field": "embedding",
                      "vector": [1.0, 0.0, 0.0, 0.0], "alpha": 0.0},
            "limit": 10,
            "vector_filter": {"KeywordEq": {"field": "tag", "value": "y"}}})
        assert [h.doc_id for h in res.hits] == ["c"]

    def test_legacy_tuple_form(self):
        index = make_vector_index()
        res = index.reader().search({
            "query": "alpha",
            "vector_query": ["embedding", [1.0, 0.0, 0.0, 0.0], 0.5],
            "limit": 5})
        assert res.hits[0].doc_id == "a"

    def test_unknown_field_rejected(self):
        index = make_vector_index()
        with pytest.raises(QueryError):
            index.reader().search({
                "query": {"type": "vector", "field": "nope",
                          "vector": [1, 0, 0, 0]},
                "limit": 5})

    def test_wrong_dim_rejected(self):
        index = make_vector_index()
        with pytest.raises(QueryError):
            index.reader().search({
                "query": {"type": "vector", "field": "embedding",
                          "vector": [1, 0]},
                "limit": 5})

    def test_bad_alpha_rejected(self):
        index = make_vector_index()
        with pytest.raises(QueryError):
            index.reader().search({
                "query": {"type": "vector", "field": "embedding",
                          "vector": [1, 0, 0, 0], "alpha": 1.5},
                "limit": 5})


class TestHybrid:
    def test_blend(self):
        index = make_vector_index()
        reader = index.reader()
        text_only = reader.search({"query": "document", "limit": 5})
        hybrid = reader.search({
            "query": "document",
            "vector_query": {"field": "embedding",
                             "vector": [0.0, 1.0, 0.0, 0.0], "alpha": 0.5},
            "limit": 5})
        ids = [h.doc_id for h in hybrid.hits]
        assert "c" in ids and "a" in ids
        t = {h.doc_id: h.score for h in text_only.hits}
        hy = {h.doc_id: h.score for h in hybrid.hits}
        # blended: alpha*bm25 + (1-alpha)*cosine
        assert hy["c"] == pytest.approx(0.5 * t["c"] + 0.5 * 1.0, rel=1e-4)
        assert hy["a"] == pytest.approx(0.5 * t["a"] + 0.5 * 0.0, abs=1e-4)

    def test_hybrid_requires_text_match(self):
        """Vector candidates that don't match the text query are excluded
        (parity: collect_vector_maps require_text_match,
        `api/reader.rs:2387-2443`)."""
        index = make_vector_index()
        hybrid = index.reader().search({
            "query": "alpha",
            "vector_query": {"field": "embedding",
                             "vector": [0.0, 1.0, 0.0, 0.0], "alpha": 0.5},
            "limit": 5})
        assert [h.doc_id for h in hybrid.hits] == ["a"]

    def test_missing_vector_penalty(self):
        index = make_vector_index()
        res = index.reader().search({
            "query": "document",
            "vector_query": {"field": "embedding",
                             "vector": [1.0, 0.0, 0.0, 0.0], "alpha": 0.5},
            "limit": 10})
        scores = {h.doc_id: h.score for h in res.hits}
        # doc d matched the text but has no vector → cosine penalty -1
        assert "d" in scores
        assert scores["d"] < scores["a"]
        assert res.hits[-1].doc_id == "d" or scores["d"] <= min(
            v for k, v in scores.items() if k != "d")

    def test_alpha_one_is_text_only_scores(self):
        index = make_vector_index()
        reader = index.reader()
        text_only = reader.search({"query": "alpha", "limit": 5})
        hybrid = reader.search({
            "query": "alpha",
            "vector_query": {"field": "embedding",
                             "vector": [0.0, 1.0, 0.0, 0.0], "alpha": 1.0},
            "limit": 5})
        assert [h.doc_id for h in hybrid.hits] == \
            [h.doc_id for h in text_only.hits]
        for a, b in zip(hybrid.hits, text_only.hits):
            assert a.score == pytest.approx(b.score, rel=1e-5)

    def test_bool_with_vector_clause(self):
        index = make_vector_index()
        res = index.reader().search({
            "query": {"type": "bool",
                      "should": [
                          {"type": "term", "field": "body",
                           "value": "alpha"},
                          {"type": "vector", "field": "embedding",
                           "vector": [0.0, 1.0, 0.0, 0.0], "alpha": 0.0},
                      ]},
            "limit": 10})
        ids = [h.doc_id for h in res.hits]
        assert "c" in ids

    def test_conflicting_vector_specs_rejected(self):
        index = make_vector_index()
        with pytest.raises(QueryError):
            index.reader().search({
                "query": {"type": "vector", "field": "embedding",
                          "vector": [1, 0, 0, 0]},
                "vector_query": {"field": "embedding",
                                 "vector": [1, 0, 0, 0]},
                "limit": 5})


class TestVectorMultiSegment:
    def test_results_across_segments(self):
        index = make_vector_index()
        writer = index.writer()
        writer.add_document({"_id": "e", "body": "epsilon",
                             "tag": "z",
                             "embedding": [0.95, 0.05, 0.0, 0.0]})
        writer.commit()
        res = index.reader().search({
            "query": {"type": "vector", "field": "embedding",
                      "vector": [1.0, 0.0, 0.0, 0.0], "alpha": 0.0},
            "limit": 3})
        assert [h.doc_id for h in res.hits][:2] == ["a", "e"]
