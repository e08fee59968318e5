"""Globally sorted, range-partitioned Parquet export.

``Dataset.sort`` is Ray Data's sample-based range-partitioning sort — the
scale-right global sort (each output block covers a disjoint key range; no
worker ever holds more than its range). This sink materializes that
property into the layout: one ``part-NNNNN.parquet`` per sorted block,
payload written on the WORKERS (content-addressed, idempotent under task
retries — the driver only renames by rank over a part-count-sized
manifest), so ``sorted(os.listdir())`` IS the global order. Readers prune
by range from Parquet footer statistics alone — no side-channel index.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc


def write_sorted_range_partitioned(ds, sort_col: str, out_dir: str,
                                   descending: bool = False):
    """Sort globally by ``sort_col``; write one Parquet part per sorted
    block. Returns the manifest (part_idx, path, min, max, n_rows) as
    pandas — rows are disjoint, ordered ranges."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    # wipe the previous generation: a re-export with fewer blocks must not
    # leave stale higher-numbered parts for readers to pick up (same
    # discipline as the MinHash sig_path sink)
    for f in os.listdir(out_dir):
        if (f.startswith(("part-", "raw-", ".")) and
                f.endswith((".parquet", ".tmp"))):
            os.remove(os.path.join(out_dir, f))
    sorted_ds = ds.sort(sort_col, descending=descending)

    def write_part(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "min": pa.array([], batch[sort_col].type),
                             "max": pa.array([], batch[sort_col].type),
                             "n_rows": pa.array([], pa.int64())})
        buf = pa.BufferOutputStream()
        pq.write_table(batch, buf)
        payload = buf.getvalue().to_pybytes()
        name = hashlib.md5(payload).hexdigest()
        tmp = os.path.join(out_dir, f".{name}.tmp")
        dst = os.path.join(out_dir, f"raw-{name}.parquet")
        if not os.path.exists(dst):
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, dst)  # atomic, idempotent under retries
        col = batch[sort_col]
        return pa.table({
            "path": pa.array([dst]),
            "min": pa.array([pc.min(col).as_py()], col.type),
            "max": pa.array([pc.max(col).as_py()], col.type),
            "n_rows": pa.array([len(batch)], pa.int64()),
        })

    man = (sorted_ds
           .map_batches(write_part, batch_format="pyarrow", batch_size=None)
           .to_pandas())  # small: one row per block
    man = man.sort_values(["min", "max"],
                          ascending=[not descending] * 2).reset_index(drop=True)
    paths = []
    renamed: dict[str, str] = {}  # two byte-identical blocks share one raw
    for i, row in man.iterrows():
        dst = os.path.join(out_dir, f"part-{i:05d}.parquet")
        src = row["path"]
        if src in renamed:  # duplicate payload: copy the renamed twin
            import shutil

            shutil.copyfile(renamed[src], dst)
        else:
            os.replace(src, dst)
            renamed[src] = dst
        paths.append(dst)
    man["path"] = paths
    man.insert(0, "part_idx", range(len(man)))
    return man


def read_sorted_range(out_dir: str, sort_col: str, lo=None, hi=None):
    """Range-pruned read: open only the parts whose footer-stats
    [min, max] of ``sort_col`` intersects [lo, hi] (both bounds
    inclusive; None = unbounded). Returns a Dataset; with no part
    surviving the pruning, an empty Dataset with the store's schema.
    A store with no parts at all (empty export) raises FileNotFoundError."""
    import pyarrow.parquet as pq
    import ray.data as rd

    parts = sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir)
                   if f.startswith("part-") and f.endswith(".parquet"))
    if not parts:
        raise FileNotFoundError(
            f"no part-*.parquet files in {out_dir!r} (empty or missing store)")
    keep = []
    for p in parts:
        md = pq.ParquetFile(p).metadata
        pmin = pmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == sort_col and col.statistics:
                    s = col.statistics
                    pmin = s.min if pmin is None else min(pmin, s.min)
                    pmax = s.max if pmax is None else max(pmax, s.max)
        if pmin is None:  # no stats → cannot prune, must read
            keep.append(p)
        elif (lo is None or pmax >= lo) and (hi is None or pmin <= hi):
            keep.append(p)
    if not keep:
        return rd.read_parquet(parts[:1]).filter(lambda r: False)
    return rd.read_parquet(keep)
