"""S5/S6: N-Quads source and sink as Ray Data transforms.

Line-oriented → embarrassingly parallel both ways (unlike the reference,
which re-parses the whole ``.nq`` into one in-memory rdflib graph on every
download — ``/root/reference/src/cattle.py:308-309``).
"""

from __future__ import annotations

import pyarrow as pa

from ..model import format_nquads_batch, parse_nquads_lines


def read_nquads(paths):
    """``.nq`` / ``.nq.gz`` file(s) → quad Dataset (S6).

    Gzipped parts (the S9 distributed sink form) inflate transparently in
    the read tasks: Ray's ``read_text`` detects the codec per file from the
    extension (``pa.Codec.detect``) — no driver-side inflation, mixed
    plain/gz directories just work."""
    import ray.data as rd

    ds = rd.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        return parse_nquads_lines(batch["text"].to_pylist())

    return ds.map_batches(parse, batch_format="pyarrow")


def write_nquads(triples_ds, out_dir: str, include_graph: bool = True,
                 gzip_parts: bool = False):
    """Quad Dataset → directory of ``.nq`` part files (S5).

    ``gzip_parts=True`` writes ``.nq.gz`` parts (S9 distributed form —
    per-part gzip with ``mtime=0`` keeps bytes deterministic and the
    content-addressed names stable; the DRIVER-side gzip export remains
    :func:`cattle_ray.serialize.serialize_collected`, mirroring
    ``src/cattle.py:313-319``).
    """
    import gzip as _gzip
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        lines = format_nquads_batch(batch, include_graph=include_graph)
        payload = ("\n".join(lines["line"].to_pylist()) + "\n").encode("utf-8")
        # content-addressed part name → idempotent under Ray task retries
        # (generalizes the reference's hash-folder memoization,
        #  /root/reference/src/hash_folder.py:35-43)
        name = hashlib.md5(payload).hexdigest()
        ext = ".nq.gz" if gzip_parts else ".nq"
        if gzip_parts:
            payload = _gzip.compress(payload, mtime=0)
        tmp = os.path.join(out_dir, f".{name}.tmp")
        dst = os.path.join(out_dir, f"part-{name}{ext}")
        if not os.path.exists(dst):
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, dst)  # atomic commit
        return pa.table({"path": pa.array([dst]), "n_lines": pa.array([len(lines)])})

    manifest = triples_ds.map_batches(write_block, batch_format="pyarrow")
    return manifest.to_pandas()  # small: one row per block


def nquads_lines(triples_ds, include_graph: bool = True):
    """Quad Dataset → Dataset with a single ``line`` column (caller picks the
    sink: write to storage, gzip, or stream)."""
    return triples_ds.map_batches(
        lambda b: format_nquads_batch(b, include_graph=include_graph),
        batch_format="pyarrow",
    )
