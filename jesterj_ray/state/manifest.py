"""Checkpoint manifest — the FTI (fault-tolerant indexing) analog.

Reference: JesterJ persists every document status transition to embedded
Cassandra (``jj_output_step_status``; reference
``ingest/model/impl/ScannerImpl.java:117-177``) so a killed run resumes
without re-delivering documents, and retries ERROR docs up to 3 times
before marking them DEAD (``ScannerImpl.java:57,614-713``).

Our batch analog (SURVEY.md §3.3 / FIXTURES.md F3): one manifest JSON file
per partition, committed via write-to-temp + ``os.replace`` (atomic on
POSIX) only AFTER the partition's output files were themselves atomically
renamed into place.  Resume = list committed manifests, skip those
partitions.  A partition that fails repeatedly is recorded DEAD with its
error (poison quarantine) so one bad partition cannot wedge the job.

Statuses used (subset of the reference's 11-value enum,
``ingest/model/Status.java:30-183``): PROCESSING, INDEXED, ERROR, DEAD.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from typing import Dict, List, Optional

STATUS_PROCESSING = "PROCESSING"
STATUS_INDEXED = "INDEXED"
STATUS_ERROR = "ERROR"
STATUS_DEAD = "DEAD"

MAX_ATTEMPTS = 3  # mirrors DEF_MAX_ERROR_RETRY (ScannerImpl.java:57)


def atomic_write_bytes(path: str, data: bytes) -> None:
    """Write bytes to ``path`` atomically (temp file + rename)."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-", suffix=f"-{uuid.uuid4().hex[:8]}")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def atomic_write_table(path: str, table, row_group_size: int = None) -> int:
    """Write a pyarrow table to parquet atomically; returns bytes written.
    ``row_group_size`` bounds reader memory for files consumed by
    streaming iterators (the k-way run merge)."""
    import pyarrow.parquet as pq
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}.parquet")
    try:
        pq.write_table(table, tmp, row_group_size=row_group_size)
        nbytes = os.path.getsize(tmp)
        os.replace(tmp, path)
        return nbytes
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


class Manifest:
    """Per-partition checkpoint manifest rooted at ``<dir>/manifest``."""

    def __init__(self, root: str, stage: str):
        self.dir = os.path.join(root, "manifest", stage)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, partition_id: int) -> str:
        return os.path.join(self.dir, f"part-{partition_id:05d}.json")

    def commit(self, partition_id: int, *, status: str = STATUS_INDEXED,
               input_fingerprint: str = "", docs_seen: int = 0,
               terms_emitted: int = 0, bytes_written: int = 0,
               dl_sum: int = 0, output_files: Optional[List[str]] = None,
               attempt: int = 1, message: str = "") -> None:
        rec = {
            "partition_id": partition_id,
            "status": status,
            "input_fingerprint": input_fingerprint,
            "docs_seen": docs_seen,
            "terms_emitted": terms_emitted,
            "bytes_written": bytes_written,
            "dl_sum": dl_sum,
            "output_files": output_files or [],
            "attempt": attempt,
            "message": message,
        }
        atomic_write_bytes(self._path(partition_id), json.dumps(rec).encode())

    def read(self, partition_id: int) -> Optional[Dict]:
        try:
            with open(self._path(partition_id)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def all(self) -> Dict[int, Dict]:
        out: Dict[int, Dict] = {}
        if not os.path.isdir(self.dir):
            return out
        for name in os.listdir(self.dir):
            if name.startswith("part-") and name.endswith(".json"):
                try:
                    with open(os.path.join(self.dir, name)) as f:
                        rec = json.load(f)
                    out[rec["partition_id"]] = rec
                except (json.JSONDecodeError, KeyError, OSError):
                    continue
        return out

    def completed_partitions(self) -> List[int]:
        return sorted(pid for pid, rec in self.all().items()
                      if rec.get("status") == STATUS_INDEXED)

    def attempt_of(self, partition_id: int) -> int:
        rec = self.read(partition_id)
        return int(rec.get("attempt", 0)) if rec else 0
