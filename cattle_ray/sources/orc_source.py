"""ORC source and sink as Ray Data transforms.

Ray 2.49 ships no ``read_orc``, so this builds one from the same recipe as
the engine's other sources: the DRIVER touches only footers (stripe counts
— ORC's row-group analogue), then one task reads one (file, stripe) pair,
so a single 100-GB file still fans out across the cluster and a directory
of shards reads embarrassingly parallel. Column pruning pushes into the
stripe read (``ORCFile.read_stripe(i, columns)``) — only requested columns
leave storage.

The sink mirrors the repo's content-addressed part convention
(``part-<md5(payload)>.orc``): reruns of identical blocks overwrite
byte-identical files, so the sink is idempotent; like the nquads/jsonl
sinks it has SET semantics for byte-identical blocks (documented caveat).
"""

from __future__ import annotations

import pyarrow as pa


def _orc_files(paths) -> list[str]:
    import os

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".orc"))
        else:
            out.append(p)
    return out


def read_orc(paths, columns=None):
    """ORC file(s)/dir(s) → Dataset. One read task per (file, stripe)."""
    import pyarrow.orc as orc
    import ray.data as rd

    items = []
    for f in _orc_files(paths):
        # footer-only open: nstripes is metadata, no row bytes touched
        n = orc.ORCFile(f).nstripes
        items.extend({"path": f, "stripe": i} for i in range(n))
    if not items:
        raise FileNotFoundError(f"no .orc files under {paths!r}")

    def read_stripe(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc  # worker-side import

        tables = []
        for path, stripe in zip(batch["path"].to_pylist(),
                                batch["stripe"].to_pylist()):
            t = orc.ORCFile(path).read_stripe(stripe, columns=columns)
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            tables.append(t)
        return pa.concat_tables(tables)

    # one stripe per block: batch_size=1 + a block per item keeps each
    # read task's memory at one stripe, and downstream stages see real
    # parallelism even for a single many-striped file
    return rd.from_items(items, override_num_blocks=len(items)).map_batches(
        read_stripe, batch_size=1, batch_format="pyarrow")


def write_orc(ds, out_dir: str, stripe_size: int | None = None) -> int:
    """Dataset → directory of content-addressed ``part-<md5>.orc`` files,
    one per block (ORC stripes within). Returns the number of parts."""
    import hashlib
    import io
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc  # worker-side import

        if len(batch) == 0:
            return pa.table({"part": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        buf = io.BytesIO()
        kw = {"stripe_size": stripe_size} if stripe_size else {}
        orc.write_table(batch, buf, **kw)
        payload = buf.getvalue()
        name = f"part-{hashlib.md5(payload).hexdigest()}.orc"
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))  # atomic publish
        return pa.table({"part": pa.array([name], pa.string()),
                         "rows": pa.array([len(batch)], pa.int64())})

    receipts = ds.map_batches(write_block, batch_format="pyarrow")
    return int(receipts.count())
