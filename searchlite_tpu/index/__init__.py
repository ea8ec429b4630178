"""Index root: create/open, writer/reader handles, compaction.

Parity with searchlite-core `index/mod.rs`: single-writer/multi-reader
via a writer lock + manifest lock; ``compact()`` rewrites all live docs
from every segment into a single segment at generation max+1, swaps the
manifest atomically, then deletes the old files; compaction refuses to
run when any indexed/fast field isn't stored (the rewrite would lose
data, `index/mod.rs:202-212`).
"""

from __future__ import annotations

import threading
from typing import Optional

from searchlite_tpu.errors import SchemaError, StorageError
from searchlite_tpu.index import directory
from searchlite_tpu.index.manifest import Manifest, Schema
from searchlite_tpu.index.segment import SegmentReader, SegmentWriter
from searchlite_tpu.index.wal import Wal
from searchlite_tpu.storage import FsStorage, InMemoryStorage, Storage


class Index:
    def __init__(self, storage: Storage, manifest: Manifest, options=None):
        from searchlite_tpu.api.types import IndexOptions

        self.storage = storage
        self._manifest = manifest
        self._manifest_lock = threading.RLock()
        self.writer_lock = threading.RLock()
        self.options = options or IndexOptions(path="")

    # -- constructors --------------------------------------------------------

    @classmethod
    def create(cls, options, schema: Optional[Schema] = None) -> "Index":
        storage = cls._make_storage(options, create=True)
        return cls.create_with_storage(storage, options, schema)

    @classmethod
    def create_with_storage(cls, storage: Storage, options,
                            schema: Optional[Schema] = None) -> "Index":
        if storage.exists("MANIFEST.json"):
            raise StorageError("index already exists")
        schema = schema or Schema.default_text_body()
        schema.validate_config()
        manifest = Manifest(schema=schema)
        manifest.store(storage)
        return cls(storage, manifest, options)

    @classmethod
    def open(cls, options, schema: Optional[Schema] = None) -> "Index":
        storage = cls._make_storage(options, create=options.create_if_missing)
        return cls.open_with_storage(storage, options, schema)

    @classmethod
    def open_with_storage(cls, storage: Storage, options,
                          schema: Optional[Schema] = None) -> "Index":
        if not storage.exists("MANIFEST.json"):
            if options.create_if_missing:
                return cls.create_with_storage(storage, options, schema)
            raise StorageError("index does not exist (no MANIFEST.json)")
        manifest = Manifest.load(storage)
        return cls(storage, manifest, options)

    @staticmethod
    def _make_storage(options, create: bool) -> Storage:
        from searchlite_tpu.api.types import StorageType

        if options.storage == StorageType.IN_MEMORY:
            return InMemoryStorage()
        return FsStorage(str(options.path), create=create)

    # -- manifest access ------------------------------------------------------

    @property
    def manifest(self) -> Manifest:
        with self._manifest_lock:
            return self._manifest

    def set_manifest(self, manifest: Manifest) -> None:
        with self._manifest_lock:
            self._manifest = manifest

    def reload_manifest(self) -> Manifest:
        with self._manifest_lock:
            self._manifest = Manifest.load(self.storage)
            return self._manifest

    @property
    def schema(self) -> Schema:
        return self.manifest.schema

    # -- handles ---------------------------------------------------------------

    def writer(self):
        from searchlite_tpu.api.writer import IndexWriter

        return IndexWriter(self)

    def reader(self):
        from searchlite_tpu.api.reader import IndexReader

        return IndexReader(self)

    # -- maintenance -----------------------------------------------------------

    def ensure_compact_safe(self) -> None:
        for f in self.schema.resolved_fields():
            if (f.indexed or f.fast) and not f.stored:
                raise SchemaError(
                    f"cannot compact: field `{f.path}` is indexed/fast but "
                    "not stored; rewriting would lose data")

    def compact(self) -> None:
        with self.writer_lock:
            manifest = self.reload_manifest()
            if len(manifest.segments) <= 1 and not manifest.total_deleted():
                return
            self.ensure_compact_safe()
            old_segments = list(manifest.segments)
            next_gen = max(
                (s.generation for s in old_segments), default=0) + 1

            def live_docs():
                for seg_meta in old_segments:
                    reader = SegmentReader(seg_meta, self.storage)
                    for ordinal in reader.live_docs():
                        yield reader.get_doc(ordinal)

            writer = SegmentWriter(
                manifest.schema, self.storage,
                enable_positions=self.options.enable_positions,
                compress=self.options.compress_docstore)
            new_meta = writer.write_segment(live_docs(), next_gen)
            manifest.segments = [new_meta]
            manifest.generation += 1
            manifest.store(self.storage)
            self.set_manifest(manifest)
            self.cleanup_segments([s.id for s in old_segments])

    def cleanup_segments(self, segment_ids: list[int]) -> None:
        for seg_id in segment_ids:
            paths = directory.segment_paths(seg_id)
            for path in paths.all_files():
                try:
                    self.storage.remove_if_exists(path)
                except StorageError:
                    pass
            for f in list(self.storage.list_files()):
                if f.startswith(paths.vector_dir + "/"):
                    self.storage.remove_if_exists(f)

    # -- stats ------------------------------------------------------------------

    def stats(self) -> dict:
        m = self.manifest
        return {
            "documents": m.total_docs() - m.total_deleted(),
            "deleted_documents": m.total_deleted(),
            "segments": len(m.segments),
            "committed_at": m.committed_at,
            "uuid": m.uuid,
        }

    @property
    def wal(self) -> Wal:
        return Wal(self.storage)
