"""Remote artifact paths (S3 / multi-storage-client analog).

Reference parity: `nemo/utils/s3_utils.py`, `nemo/utils/msc_utils.py` and
the S3CheckpointIO path (`lightning/pytorch/plugins/s3_checkpoint_io.py`):
checkpoints/artifacts addressed by URL, staged through local disk.

Design: a small scheme-registry of storage backends. `s3://` uses boto3
when the wheel is present (absent in this environment — the backend then
raises with a clear message); `mem://` is an in-process store used by tests
to exercise the exact staging paths without network. `Model.save_to` /
`restore_from` accept any registered scheme.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Dict, Optional, Tuple

_BACKENDS: Dict[str, "StorageBackend"] = {}


def register_backend(scheme: str, backend: "StorageBackend") -> None:
    _BACKENDS[scheme] = backend


def split_url(url: str) -> Tuple[str, str]:
    scheme, _, rest = url.partition("://")
    return scheme, rest


def is_remote(path: str) -> bool:
    return "://" in path and split_url(path)[0] in _BACKENDS


class StorageBackend:
    def put(self, local_path: str, url: str) -> None:
        raise NotImplementedError

    def get(self, url: str, local_path: str) -> None:
        raise NotImplementedError

    def exists(self, url: str) -> bool:
        raise NotImplementedError


class MemBackend(StorageBackend):
    """In-process object store (tests / single-process staging)."""

    def __init__(self):
        self.blobs: Dict[str, bytes] = {}

    def put(self, local_path: str, url: str) -> None:
        with open(local_path, "rb") as f:
            self.blobs[url] = f.read()

    def get(self, url: str, local_path: str) -> None:
        with open(local_path, "wb") as f:
            f.write(self.blobs[url])

    def exists(self, url: str) -> bool:
        return url in self.blobs


class S3Backend(StorageBackend):
    """boto3-backed S3 (reference s3_utils.py). Lazy import: this
    environment ships no boto3, so construction is cheap and use raises a
    clear error instead of an ImportError at module load."""

    def _client(self):
        try:
            import boto3  # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "s3:// paths need boto3, which is not installed in this "
                "environment") from e
        return boto3.client("s3")

    def _bucket_key(self, url: str) -> Tuple[str, str]:
        rest = split_url(url)[1]
        bucket, _, key = rest.partition("/")
        return bucket, key

    def put(self, local_path: str, url: str) -> None:
        b, k = self._bucket_key(url)
        self._client().upload_file(local_path, b, k)

    def get(self, url: str, local_path: str) -> None:
        b, k = self._bucket_key(url)
        self._client().download_file(b, k, local_path)

    def exists(self, url: str) -> bool:
        b, k = self._bucket_key(url)
        try:
            self._client().head_object(Bucket=b, Key=k)
            return True
        except Exception:
            return False


register_backend("mem", MemBackend())
register_backend("s3", S3Backend())
register_backend("msc", S3Backend())  # msc:// routed like s3 (msc_utils.py)


def stage_out(local_path: str, url: str) -> None:
    """Publish a finished local file to a remote URL."""
    scheme = split_url(url)[0]
    _BACKENDS[scheme].put(local_path, url)


def stage_in(url: str, local_dir: Optional[str] = None) -> str:
    """Fetch a remote URL to local disk; returns the local path."""
    scheme, rest = split_url(url)
    local_dir = local_dir or tempfile.mkdtemp(prefix="nemo_tpu_stage_")
    local = os.path.join(local_dir, os.path.basename(rest) or "blob")
    _BACKENDS[scheme].get(url, local)
    return local
