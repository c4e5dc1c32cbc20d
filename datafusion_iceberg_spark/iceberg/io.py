"""Object-store indirection for metadata/manifest/Avro IO.

The reference registers a per-table ``ObjectStore`` so the same scan code
reads local FS or S3 (datafusion_iceberg/src/table.rs:116-126,
catalog_rest/src/catalog.rs:88-96).  This module plays that role for the
driver-side metadata path: every metadata read/write routes through a
scheme-keyed ``FileIO`` registry instead of bare ``open()``/``glob``.

Built-ins: local paths and ``file://`` (LocalIO), ``memory://`` (MemoryIO,
an in-process store used by tests to prove the indirection carries a
non-posix scheme end-to-end).  ``s3://``/``s3a://`` resolve to S3IO, which
binds to fsspec/s3fs or boto3 when present and raises a clear error when
neither is installed (this container has neither — the seam is the
deliverable, mirroring how the reference delegates actual S3 wire IO to
the external object_store crate).

The *data* path (parquet scan) is Spark's own Hadoop connectors; metadata
``localize()`` hands Spark scheme-qualified paths it already understands.
"""

from __future__ import annotations

import fnmatch
import glob as _glob
import io as _pyio
import os
import re
import threading
from typing import BinaryIO

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")


def scheme_of(path: str) -> str:
    m = _SCHEME_RE.match(path)
    return m.group(1).lower() if m else ""


def _strip_file(path: str) -> str:
    return path[len("file://") :] if path.startswith("file://") else path


class LocalIO:
    """Posix filesystem; accepts bare paths and file:// URIs."""

    def open_read(self, path: str) -> BinaryIO:
        return open(_strip_file(path), "rb")

    def read_bytes(self, path: str) -> bytes:
        with self.open_read(path) as fh:
            return fh.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        p = _strip_file(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as fh:
            fh.write(data)

    def exists(self, path: str) -> bool:
        return os.path.exists(_strip_file(path))

    def glob(self, pattern: str) -> list[str]:
        # results come back in the caller's scheme (file:// in → file:// out)
        prefix = "file://" if pattern.startswith("file://") else ""
        return [prefix + p for p in sorted(_glob.glob(_strip_file(pattern)))]

    def getsize(self, path: str) -> int:
        return os.path.getsize(_strip_file(path))


class MemoryIO:
    """In-process blob store (one shared namespace per instance)."""

    def __init__(self) -> None:
        self._blobs: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def open_read(self, path: str) -> BinaryIO:
        with self._lock:
            if path not in self._blobs:
                raise FileNotFoundError(path)
            return _pyio.BytesIO(self._blobs[path])

    def read_bytes(self, path: str) -> bytes:
        with self.open_read(path) as fh:
            return fh.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        with self._lock:
            self._blobs[path] = bytes(data)

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._blobs

    def glob(self, pattern: str) -> list[str]:
        with self._lock:
            return sorted(fnmatch.filter(self._blobs, pattern))

    def getsize(self, path: str) -> int:
        with self._lock:
            return len(self._blobs[path])


class S3IO:
    """S3 metadata IO via fsspec/s3fs or boto3 — whichever is installed.

    The wire protocol is out of scope here the same way it is for the
    reference (delegated to the object_store crate); this class is the
    binding seam.  Instantiation fails with an actionable message when no
    S3 client library is available.
    """

    def __init__(self, client=None) -> None:
        self._fs = None
        self._boto = None
        if client is not None:
            # injected boto3-compatible client (tests use an in-process
            # fake, mirroring the reference's env-gated S3 test,
            # catalog.rs:85-96, without network)
            self._boto = client
            return
        try:  # pragma: no cover - optional dependency
            import fsspec

            self._fs = fsspec.filesystem("s3")
            return
        except Exception:
            pass
        try:  # pragma: no cover - optional dependency
            import boto3

            self._boto = boto3.client("s3")
            return
        except Exception:
            pass
        raise ImportError(
            "s3:// table roots need fsspec+s3fs or boto3 installed; "
            "neither is available in this environment"
        )

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        rest = re.sub(r"^s3a?://", "", path)
        bucket, _, key = rest.partition("/")
        return bucket, key

    def open_read(self, path: str) -> BinaryIO:  # pragma: no cover
        if self._fs is not None:
            return self._fs.open(re.sub(r"^s3a://", "s3://", path), "rb")
        bucket, key = self._split(path)
        body = self._boto.get_object(Bucket=bucket, Key=key)["Body"]
        return _pyio.BytesIO(body.read())

    def read_bytes(self, path: str) -> bytes:  # pragma: no cover
        with self.open_read(path) as fh:
            return fh.read()

    def write_bytes(self, path: str, data: bytes) -> None:  # pragma: no cover
        if self._fs is not None:
            with self._fs.open(re.sub(r"^s3a://", "s3://", path), "wb") as fh:
                fh.write(data)
            return
        bucket, key = self._split(path)
        self._boto.put_object(Bucket=bucket, Key=key, Body=data)

    def exists(self, path: str) -> bool:  # pragma: no cover
        if self._fs is not None:
            return self._fs.exists(re.sub(r"^s3a://", "s3://", path))
        bucket, key = self._split(path)
        try:
            self._boto.head_object(Bucket=bucket, Key=key)
            return True
        except Exception:
            return False

    def glob(self, pattern: str) -> list[str]:  # pragma: no cover
        if self._fs is not None:
            return sorted(
                "s3://" + p
                for p in self._fs.glob(re.sub(r"^s3a?://", "", pattern))
            )
        bucket, key_pat = self._split(pattern)
        prefix = key_pat.split("*")[0]
        out = []
        for page in self._boto.get_paginator("list_objects_v2").paginate(
            Bucket=bucket, Prefix=prefix
        ):
            for obj in page.get("Contents", []):
                if fnmatch.fnmatch(obj["Key"], key_pat):
                    out.append(f"s3://{bucket}/{obj['Key']}")
        return sorted(out)

    def getsize(self, path: str) -> int:  # pragma: no cover
        if self._fs is not None:
            return self._fs.size(re.sub(r"^s3a://", "s3://", path))
        bucket, key = self._split(path)
        return self._boto.head_object(Bucket=bucket, Key=key)["ContentLength"]


_local = LocalIO()
_memory = MemoryIO()
_REGISTRY: dict[str, object] = {"": _local, "file": _local, "memory": _memory}
_LAZY = {"s3": S3IO, "s3a": S3IO}


def register_io(scheme: str, impl) -> None:
    """Plug a FileIO implementation in for a scheme (the analogue of the
    reference's per-table object-store registration, table.rs:116-126)."""
    _REGISTRY[scheme.lower()] = impl


def get_io(path: str):
    s = scheme_of(path)
    if s in _REGISTRY:
        return _REGISTRY[s]
    if s in _LAZY:
        _REGISTRY[s] = _LAZY[s]()  # raises ImportError when unbacked
        return _REGISTRY[s]
    raise ValueError(f"no FileIO registered for scheme {s!r} ({path})")


def memory_io() -> MemoryIO:
    """The process-wide memory:// store (tests)."""
    return _memory
