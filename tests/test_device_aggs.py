"""Device-side aggregation partials (ops/device_aggs.py) must produce
responses identical to the host collectors — counts bit-exact, stats
within f32-sum tolerance (D8-class divergence, module doc)."""

import random

import pytest

from searchlite_tpu.api.types import IndexOptions, StorageType
from searchlite_tpu.index import Index
from searchlite_tpu.index.manifest import Schema


@pytest.fixture(scope="module")
def index():
    rng = random.Random(91)
    vocab = [f"w{i}" for i in range(50)]
    idx = Index.create(
        IndexOptions(path="", create_if_missing=True,
                     storage=StorageType.IN_MEMORY),
        Schema.from_json({
            "text_fields": [{"name": "body", "analyzer": "default",
                             "stored": False, "indexed": True}],
            "keyword_fields": [
                {"name": "cat", "stored": False, "indexed": True,
                 "fast": True},
                {"name": "tags", "stored": False, "indexed": True,
                 "fast": True}],
            "numeric_fields": [
                {"name": "price", "i64": False, "stored": False,
                 "fast": True},
                {"name": "qty", "i64": True, "stored": False,
                 "fast": True}],
        }))
    writer = idx.writer()
    for i in range(900):
        doc = {
            "_id": str(i),
            "body": " ".join(rng.choices(vocab, k=rng.randint(3, 15))),
            "cat": rng.choice(["a", "b", "c", "d"]),
            # multi-valued: forces the host fallback for `tags`
            "tags": rng.sample(["x", "y", "z", "u"],
                               k=rng.randint(1, 3)),
        }
        if rng.random() < 0.9:  # some docs miss numeric values
            doc["price"] = round(rng.uniform(0, 100), 2)
        if rng.random() < 0.8:
            doc["qty"] = rng.randint(0, 50)
        writer.add_document(doc)
        if i == 450:
            writer.commit()  # two segments
    writer.commit()
    return idx


AGGS = {
    "cats": {"type": "terms", "field": "cat", "size": 10},
    "price_hist": {"type": "histogram", "field": "price",
                   "interval": 7.5},
    "price_ranges": {"type": "range", "field": "price",
                     "ranges": [{"to": 25.0},
                                {"from": 20.0, "to": 60.0},
                                {"from": 60.0}]},
    "qty_stats": {"type": "stats", "field": "qty"},
    "qty_count": {"type": "value_count", "field": "qty"},
}


def _assert_agg_parity(dev, host, approx_stats=("qty_stats",)):
    assert set(dev) == set(host)
    for name in host:
        if name in approx_stats:
            h, d = host[name], dev[name]
            assert d["count"] == h["count"]
            assert d["min"] == h["min"]
            assert d["max"] == h["max"]
            assert d["sum"] == pytest.approx(h["sum"], rel=1e-5)
            assert d["avg"] == pytest.approx(h["avg"], rel=1e-5)
        else:
            assert dev[name] == host[name], name


@pytest.mark.parametrize("query", ["w1", "w2 w9 w17", "w40"])
def test_device_aggs_match_host_collectors(index, query, monkeypatch):
    reader = index.reader()
    req = {"query": query, "limit": 5, "aggs": AGGS}
    dev = reader.search(req).aggregations
    monkeypatch.setenv("SEARCHLITE_DEVICE_AGGS", "0")
    host = index.reader().search(req).aggregations
    _assert_agg_parity(dev, host)


def test_multivalued_column_falls_back_to_host(index, monkeypatch):
    """`tags` is multi-valued → the whole request collects host-side
    (plan_device_aggs returns None); results must still be right."""
    reader = index.reader()
    req = {"query": "w3", "limit": 5,
           "aggs": {"tags": {"type": "terms", "field": "tags"},
                    "cats": {"type": "terms", "field": "cat"}}}
    got = reader.search(req).aggregations
    monkeypatch.setenv("SEARCHLITE_DEVICE_AGGS", "0")
    host = index.reader().search(req).aggregations
    assert got == host


def test_subaggs_and_missing_fall_back(index, monkeypatch):
    reader = index.reader()
    req = {"query": "w5", "limit": 5, "aggs": {
        "cats": {"type": "terms", "field": "cat",
                 "aggs": {"p": {"type": "stats", "field": "price"}}},
        "qty_missing": {"type": "value_count", "field": "qty",
                        "missing": 0},
    }}
    got = reader.search(req).aggregations
    monkeypatch.setenv("SEARCHLITE_DEVICE_AGGS", "0")
    host = index.reader().search(req).aggregations
    for name in host:
        if name == "qty_missing":
            assert got[name] == host[name]
        else:
            assert got[name] == host[name]


def test_device_aggs_with_filter_and_pipeline(index, monkeypatch):
    """Root filter shrinks the mask before aggregation; sibling
    pipeline aggs consume device-built responses."""
    req = {"query": "w1 w2 w3", "limit": 3,
           "filter": {"KeywordEq": {"field": "cat", "value": "a"}},
           "aggs": {
               "hist": {"type": "histogram", "field": "price",
                        "interval": 20.0},
               "total": {"type": "sum_bucket",
                         "buckets_path": "hist>_count"},
           }}
    reader = index.reader()
    dev = reader.search(req).aggregations
    monkeypatch.setenv("SEARCHLITE_DEVICE_AGGS", "0")
    host = index.reader().search(req).aggregations
    assert dev == host
