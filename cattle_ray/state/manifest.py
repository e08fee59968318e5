"""R3/G1/D1: checkpoint manifest — per-partition lineage + metrics + resume.

Generalizes the reference's content-hash-folder memoization
(``/root/reference/src/hash_folder.py:35-43``: same (csv,json) bytes → same
folder → finished work reused) done right: instead of *deleting inputs* as
the completion signal (``src/cattle_process.py:18-25``), each completed
partition appends one JSONL row

    part_id, input_part_hash, template_hash, out_path,
    n_rows_in, n_triples_out, wall_ms, status, run_ts

committed via append + ``fsync`` (single-writer: the driver; a line-sized
append is atomic on POSIX, and ``load()`` tolerates one torn trailing line
from a crash mid-append). Resume = anti-join pending partitions against
committed ``(part_id, input_part_hash, template_hash)`` keys; partition
output files are content-addressed so a double-commit is idempotent
(FIXTURES.md §6).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass


def content_hash(data: bytes) -> str:
    """F1: md5 content hash (``src/hash_folder.py:10-32`` without the
    degrading partial-read fallback — Arrow buffers are clean)."""
    return hashlib.md5(data).hexdigest()


def template_hash(template_dict: dict) -> str:
    return content_hash(json.dumps(template_dict, sort_keys=True).encode())


MANIFEST_FIELDS = [
    "part_id", "input_part_hash", "template_hash", "out_path",
    "n_rows_in", "n_triples_out", "wall_ms", "status", "run_ts",
]


@dataclass
class Manifest:
    path: str

    def load(self) -> dict[tuple, dict]:
        """→ {(part_id, input_part_hash, template_hash): row} for committed rows."""
        out: dict[tuple, dict] = {}
        if not os.path.exists(self.path):
            return out
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    # a crash mid-append leaves one torn trailing line — the
                    # exact failure the manifest exists to survive; skip it
                    # (the partition simply re-runs) instead of blocking resume
                    import warnings

                    warnings.warn(f"manifest {self.path}: skipping torn line")
                    continue
                if row.get("status") == "committed":
                    out[(row["part_id"], row["input_part_hash"], row["template_hash"])] = row
        return out

    def commit(self, row: dict) -> None:
        """Append one committed row atomically (single-writer: the driver)."""
        row = {**row, "status": "committed"}
        missing = set(MANIFEST_FIELDS) - set(row)
        if missing:
            raise ValueError(f"manifest row missing fields: {missing}")
        payload = json.dumps(row, sort_keys=True)
        # append is atomic for line-sized writes on POSIX. If a previous run
        # crashed mid-append, the file ends with a TORN line and no newline —
        # appending directly would glue this commit onto the fragment and
        # lose BOTH records; terminate the fragment first.
        needs_nl = False
        if os.path.exists(self.path) and os.path.getsize(self.path) > 0:
            with open(self.path, "rb") as f:
                f.seek(-1, os.SEEK_END)
                needs_nl = f.read(1) != b"\n"
        with open(self.path, "a") as f:
            if needs_nl:
                f.write("\n")
            f.write(payload + "\n")
            f.flush()
            os.fsync(f.fileno())

    def pending(self, partitions: list[dict], tmpl_hash: str) -> list[dict]:
        """Anti-join: partitions (each {part_id, input_part_hash, ...}) not
        yet committed under this template."""
        done = self.load()
        return [
            p
            for p in partitions
            if (p["part_id"], p["input_part_hash"], tmpl_hash) not in done
        ]


def run_partitioned(
    partitions: list[dict],
    run_fn,
    manifest: Manifest,
    tmpl_hash: str,
    run_ts: str | None = None,
) -> list[dict]:
    """Drive a resumable partitioned job: for each pending partition call
    ``run_fn(part) -> (out_path, n_rows_in, n_triples_out)`` then commit.
    Returns the rows committed THIS run (test hook for the §5.2-4 resume
    assertion: a rerun commits exactly the previously-missing part_ids)."""
    run_ts = run_ts or time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    committed = []
    for part in manifest.pending(partitions, tmpl_hash):
        t0 = time.perf_counter()
        out_path, n_in, n_out = run_fn(part)
        row = {
            "part_id": part["part_id"],
            "input_part_hash": part["input_part_hash"],
            "template_hash": tmpl_hash,
            "out_path": out_path,
            "n_rows_in": n_in,
            "n_triples_out": n_out,
            "wall_ms": (time.perf_counter() - t0) * 1e3,
            "status": "committed",
            "run_ts": run_ts,
        }
        manifest.commit(row)
        committed.append(row)
    return committed
