"""Manual hash exchange — the raw-Ray-task escape hatch for full-row
shuffles.

Ray Data's groupby runs on a SORT-based shuffle; for a wide-row exchange
keyed by a low-cardinality bucket column that machinery is pathological —
profiling the 2M-page flagship showed the dedup groupby funneling the
whole 6.9M-row / 1.6 GB triple table through ONE SortMap task (230 s of
CPU, the entire scaling bottleneck), and Ray 2.49's HASH_SHUFFLE strategy
wedges outright (ROADMAP item 1, retested). Rows co-located by a hash
bucket don't need ORDER — they need a partition exchange, which is
embarrassingly parallel in plain Ray tasks:

- one ``split`` task per input block: one stable argsort of the int64
  bucket column + one Arrow ``take`` + ``num_buckets`` zero-copy slices —
  returned as ``num_buckets`` separate objects, so the object store holds
  per-(block, bucket) shards exactly like a shuffle's map output;
- one ``reduce`` task per bucket: concat its column of shards, apply the
  caller's finish function. Buckets with more shards than ``fan_in`` go
  through intermediate concat tasks (tree reduce) so no task ever takes
  an unbounded argument list at 100-TB block counts.

The input is materialized first (exactly what a sort-based shuffle does
internally); the output Dataset is built from the reduce tasks' object
refs — nothing flows through the driver. Determinism: the reduce sees
shards in input-block order, so a finish fn that (like dedup's) orders by
an explicit key before picking representatives is layout-independent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def hash_exchange(ds, bucket_col: str, finish_fn, num_buckets: int,
                  fan_in: int = 256):
    """ds (with int bucket column) → Dataset of ``finish_fn`` outputs,
    one reduce per bucket. ``finish_fn``: ``pa.Table -> pa.Table``."""
    import ray
    import ray.data as rd

    mat = ds.materialize()
    # skip empty blocks by METADATA — a stage that emits pa.table({}) for
    # a no-candidate batch produces zero-row zero-COLUMN blocks that have
    # no bucket column to split on (and contribute nothing anyway)
    block_refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for br, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                block_refs.append(br)
    if not block_refs:
        # wholly empty input: still deliver the FINISHED schema (the input
        # schema carries caller-internal columns like dedup's
        # _chash/_bucket that finish_fn strips) — run finish_fn on an
        # empty table of the input schema when one exists
        schema = mat.schema()
        base = schema if isinstance(schema, pa.Schema) else \
            getattr(schema, "base_schema", None)
        if isinstance(base, pa.Schema) and bucket_col in base.names:
            return rd.from_arrow(finish_fn(base.empty_table()))
        return mat

    @ray.remote
    def split(block):
        t = block
        if not isinstance(t, pa.Table):  # pandas block from upstream
            t = pa.Table.from_pandas(t, preserve_index=False)
        bk = t[bucket_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(bk) and (bk.min() < 0 or bk.max() >= num_buckets):
            # loud crash beats silent row loss: a bucket value outside
            # [0, num_buckets) would fall outside every slice below
            raise ValueError(
                f"{bucket_col} outside [0, {num_buckets}): "
                f"[{bk.min()}, {bk.max()}]")
        order = np.argsort(bk, kind="stable")
        srt = t.take(pa.array(order))
        bounds = np.searchsorted(bk[order], np.arange(num_buckets + 1))
        return tuple(
            srt.slice(bounds[k], bounds[k + 1] - bounds[k])
            for k in range(num_buckets)
        )

    @ray.remote
    def concat(*parts):
        return pa.concat_tables(parts)

    @ray.remote
    def reduce(*parts):
        return finish_fn(pa.concat_tables(parts))

    if num_buckets == 1:
        @ray.remote
        def to_arrow(block):
            if not isinstance(block, pa.Table):
                return pa.Table.from_pandas(block, preserve_index=False)
            return block

        shard_cols = [[to_arrow.remote(r) for r in block_refs]]
    else:
        per_block = [split.options(num_returns=num_buckets).remote(r)
                     for r in block_refs]
        shard_cols = [[pb[k] for pb in per_block]
                      for k in range(num_buckets)]

    out = []
    for refs in shard_cols:
        while len(refs) > fan_in:  # tree reduce: bound every arg list
            refs = [concat.remote(*refs[i:i + fan_in])
                    for i in range(0, len(refs), fan_in)]
        out.append(reduce.remote(*refs))
    return rd.from_arrow_refs(out)
