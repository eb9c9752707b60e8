"""Metadata I/O abstraction for the lake commit protocol.

At 100 TB the table lives on an object store, not POSIX. The snapshot
commit protocol therefore relies on exactly ONE primitive that modern
object stores provide natively (S3 If-None-Match, GCS
x-goods-if-generation-match=0, ABFS ETag): **put-if-absent**. Creating
``_meta/v{N}.json`` conditionally IS the commit point:

* uniqueness per version — two racing writers at version N: one put
  succeeds, the other gets AlreadyExists and must retry on a fresh load
  (optimistic concurrency, Iceberg's commit rule);
* durability — data files are written BEFORE the meta put, so a crash
  before the put leaves only unreferenced data files (cleaned by
  expire_snapshots), never a half-commit;
* no atomic rename needed — the ``CURRENT`` pointer file is just a
  fast-path hint; readers fall back to listing ``v*.json`` and taking
  the max version, which the put-if-absent uniqueness makes correct.

Implementations: ``LocalMetaIO`` (POSIX; exclusive-create = the
conditional put, os.replace = atomic hint update) and ``MemoryMetaIO``
(object-store semantics for tests: put-if-absent, last-writer-wins
unconditional put, NO rename — proves the protocol needs none).

Concurrency contract: ``read_text`` MUST be safe to call from multiple
driver threads concurrently (LakeTable prefetches per-bucket manifests
with a thread pool). Both shipped implementations satisfy it trivially
(independent file opens / dict reads); an object-store implementation
must use a thread-safe client or per-call connections. All MUTATING
methods are only ever called from the single writer thread.
Data-file I/O is NOT abstracted here: parquet read/write goes through
Spark's Hadoop filesystem layer, which already speaks s3a/gs/abfs.
"""

from __future__ import annotations

import os
import uuid


class AlreadyExists(FileExistsError):
    """Conditional put lost the race: the key already exists."""


class LocalMetaIO:
    """POSIX metadata I/O (the sandbox implementation)."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def put_if_absent(self, path: str, text: str) -> None:
        # write-then-hardlink: the link(2) is atomic, so a crash can
        # never leave a PARTIAL object at `path` — matching object-store
        # put atomicity (a conditional PUT either fully exists or not).
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(text)
        try:
            os.link(tmp, path)
        except FileExistsError as e:
            raise AlreadyExists(path) from e
        finally:
            os.unlink(tmp)

    def put(self, path: str, text: str) -> None:
        """Unconditional durable put (atomic on POSIX via tmp+rename;
        object stores are natively atomic per-object)."""
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def append_line(self, path: str, line: str) -> None:
        """Append-only audit log. Object-store analogue: one object per
        record under a log/ prefix, or a log service — appends are the
        only POSIX-ism the protocol keeps, and only for the non-critical
        lineage sidecar."""
        with open(path, "a") as f:
            f.write(line)

    def list(self, prefix_dir: str) -> list[str]:
        try:
            return sorted(os.listdir(prefix_dir))
        except FileNotFoundError:
            return []

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def delete(self, path: str) -> None:
        os.remove(path)


class MemoryMetaIO:
    """Object-store-semantics in-memory metadata I/O (tests).

    Deliberately provides NO rename and NO append primitive beyond
    read-modify-write — if the commit protocol works against this, it
    works against S3-style stores with only conditional puts.
    """

    def __init__(self):
        self.blobs: dict[str, str] = {}

    def read_text(self, path: str) -> str:
        if path not in self.blobs:
            raise FileNotFoundError(path)
        return self.blobs[path]

    def put_if_absent(self, path: str, text: str) -> None:
        if path in self.blobs:
            raise AlreadyExists(path)
        self.blobs[path] = text

    def put(self, path: str, text: str) -> None:
        self.blobs[path] = text

    def append_line(self, path: str, line: str) -> None:
        self.blobs[path] = self.blobs.get(path, "") + line

    def list(self, prefix_dir: str) -> list[str]:
        p = prefix_dir.rstrip("/") + "/"
        return sorted({k[len(p):].split("/", 1)[0]
                       for k in self.blobs if k.startswith(p)})

    def exists(self, path: str) -> bool:
        p = path.rstrip("/") + "/"
        return path in self.blobs or any(k.startswith(p) for k in self.blobs)

    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        # object stores have no directories; creation is a no-op, but the
        # exclusive-create contract of LakeTable.create still needs a
        # conflict check
        if not exist_ok and self.exists(path):
            raise FileExistsError(path)

    def delete(self, path: str) -> None:
        if path not in self.blobs:
            raise FileNotFoundError(path)
        del self.blobs[path]
