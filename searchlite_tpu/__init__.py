"""searchlite-tpu — a TPU-native embedded full-text search engine.

A from-scratch rebuild of the capabilities of davidkelley/searchlite
(an embedded, SQLite-flavored search engine) designed TPU-first:

- The on-disk inverted index is loaded into an HBM-resident layout:
  postings padded into fixed-width ``[n_blocks, 128]`` doc-id/tf blocks
  with per-block max-score sidecars.
- BM25 scoring is an MXU matrix product: per-posting impacts are
  precomputed at upload, query terms densified into an impact matrix
  with a block row gather + unique-index scatter, and scores computed
  as ``W @ M`` with on-device top-k instead of a per-posting heap.
- Fast-field filters are vectorized columnar predicates producing doc
  masks fused into the scoring pass.
- Vector search is exact brute-force distance on the MXU.
- Multi-chip scale-out shards postings blocks across a
  ``jax.sharding.Mesh`` with top-k merged over ICI collectives.

The durable host-side format (WAL, manifest, segments) mirrors the
reference's crash-safety semantics (single writer, atomic manifest
swaps, WAL replay).
"""

__version__ = "0.1.0"


def _tune_numpy_allocator() -> None:
    """Disable numpy's MADV_HUGEPAGE on large allocations (opt back in
    with SEARCHLITE_NUMPY_HUGEPAGE=1). On virtualized hosts where
    hugepage faults are backed lazily by the hypervisor, first-touch
    of a fresh large array measured 53 s/GB with the madvise vs
    1.4 s/GB without (this sandbox's microVM); on bare metal the
    madvise saves a few percent at most. Ingest, segment open, and
    batch prep all allocate-and-fill large arrays, so the slow path
    taxes everything."""
    import os
    import sys

    if sys.platform != "linux":
        return
    if os.environ.get("SEARCHLITE_NUMPY_HUGEPAGE") == "1":
        return
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    try:
        try:
            from numpy._core import multiarray as _ma
        except ImportError:  # numpy 1.x
            from numpy.core import multiarray as _ma
        _ma._set_madvise_hugepage(False)
    except Exception:  # noqa: BLE001 — tuning only, never fatal
        pass


_tune_numpy_allocator()


def _enable_host_tier_backend() -> None:
    """Widen ``JAX_PLATFORMS=axon`` to ``axon,cpu`` so the host tier
    (api/reader.py::_host_tier_device — small fresh segments served
    from host RAM) can reach the cpu backend next to the accelerator.
    Platform priority keeps axon the default backend; the env edit is
    a no-op once jax backends have initialized, and the tier degrades
    to disabled if the cpu backend still isn't reachable. Explicit
    single-platform pins other than plain "axon" (tests pin "cpu",
    tools pin via jax.config) are left alone. A broken accelerator
    plugin now falls back to cpu instead of raising at init —
    bench.py guards against misreading that (its device probe
    requires a non-cpu default backend)."""
    import os

    if os.environ.get("JAX_PLATFORMS") == "axon":
        os.environ["JAX_PLATFORMS"] = "axon,cpu"


_enable_host_tier_backend()


def _enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a per-user dir
    (opt out with SEARCHLITE_COMPILE_CACHE=0; an explicit
    JAX_COMPILATION_CACHE_DIR wins). A fresh serving process pays an
    XLA compile per (plan, shape-bucket) executor — minutes each over
    a remote-compile link — and nothing else carries those across
    process restarts. Like the JAX_PLATFORMS widening above, env
    edits are a no-op once jax has initialized, and jax degrades
    gracefully (warn, not raise) on backends that cannot serialize
    executables."""
    import os

    if os.environ.get("SEARCHLITE_COMPILE_CACHE") == "0":
        return
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "searchlite_tpu",
        "xla_cache")
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        return
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    # default min-compile-time gate is 1 s: keeps tiny CPU-backend
    # test compiles out of the cache while catching every executor
    # that matters over a remote tunnel
    #
    # jax binds env-var config defaults at ITS import, and this
    # environment's sitecustomize imports jax in every interpreter
    # before any package code runs — so the env edit above can never
    # be seen by jax here; set the live config too (valid any time
    # before the cache's first use)
    import sys as _sys

    if "jax" in _sys.modules and os.environ.get(
            "JAX_COMPILATION_CACHE_DIR") == cache:
        try:
            import jax

            if jax.config.jax_compilation_cache_dir is None:
                jax.config.update("jax_compilation_cache_dir", cache)
        except Exception:  # noqa: BLE001 — tuning only, never fatal
            pass


_enable_compile_cache()


def __getattr__(name):  # lazy top-level exports to keep import light
    if name in ("IndexOptions", "SearchRequest", "StorageType"):
        from searchlite_tpu.api import types

        return getattr(types, name)
    if name == "Index":
        from searchlite_tpu.index import Index

        return Index
    if name == "IndexBuilder":
        from searchlite_tpu.api.builder import IndexBuilder

        return IndexBuilder
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
