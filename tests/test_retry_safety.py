"""Retry-safety evidence: Ray re-executes failed tasks from lineage; the
engine's kernels must be deterministic so a retried task reproduces its
block exactly. Inject transient failures into a map stage feeding a
bucketed dedup and assert the result is identical to the clean run."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


@ray.remote
class _FailGate:
    """Counts down n injected failures across all workers (named actor —
    the flaky UDF consults it so exactly n task attempts die)."""

    def __init__(self, n: int):
        self.n = n

    def should_fail(self) -> bool:
        if self.n > 0:
            self.n -= 1
            return True
        return False


def test_dedup_identical_under_injected_task_failures(ray_session):
    import ray.data as rd

    from cattle_ray.stages.dedup import dedup_exact

    rng = np.random.RandomState(3)
    t = pa.table({
        "k": rng.randint(0, 300, 5000).astype(np.int64),
        "v": [f"v{i}" for i in rng.randint(0, 50, 5000)],
    })

    def run(inject: int):
        gate = _FailGate.options(
            name=f"failgate_{inject}", lifetime="detached").remote(inject)

        def flaky(b: pa.Table) -> pa.Table:
            if ray.get(gate.should_fail.remote()):
                import os

                os._exit(1)  # kill THIS worker mid-task: a real system
                # failure (raised user exceptions are not retried — worker
                # death is, via lineage re-execution)
            return b

        try:
            ds = rd.from_arrow(t).repartition(8).map_batches(
                flaky, batch_format="pyarrow")
            out = dedup_exact(ds, ["k", "v"]).to_pandas()
        finally:
            ray.kill(gate)  # detached actors outlive their creator — a
            # leak here makes any rerun die on the name collision
        return sorted(map(tuple, out.itertuples(index=False)))

    clean = run(0)
    injected = run(3)  # three task attempts die and are retried
    assert clean == injected
    assert len(clean) > 100
