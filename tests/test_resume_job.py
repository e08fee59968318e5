"""SURVEY.md §5.2-4 end-to-end resume test: kill the partitioned KG job after
k partitions, rerun, assert committed partitions are skipped and the final
output is identical to an uninterrupted run."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from cattle_ray.model import QUAD_KEY
from cattle_ray.pipelines.job import run_kg_job

N = 120
PARTS = 6


def _read_all(out_dir):
    frames = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d, "data.parquet")
        if os.path.exists(p):
            frames.append(pq.read_table(p).to_pandas())
    df = pd.concat(frames, ignore_index=True)
    return (
        df[QUAD_KEY + ["graph"]]
        .fillna("∅")
        .sort_values(QUAD_KEY, kind="mergesort")
        .reset_index(drop=True)
    )


def test_resume_after_failure(ray_session, tmp_path):
    clean = str(tmp_path / "clean")
    resumed = str(tmp_path / "resumed")

    # uninterrupted reference run
    rows = run_kg_job(N, clean, num_partitions=PARTS)
    assert [r["part_id"] for r in rows] == list(range(PARTS))

    # interrupted run: dies after 2 partitions
    with pytest.raises(RuntimeError, match="injected failure"):
        run_kg_job(N, resumed, num_partitions=PARTS, fail_after=2)

    # resume: exactly the missing partitions run
    rows2 = run_kg_job(N, resumed, num_partitions=PARTS)
    assert [r["part_id"] for r in rows2] == list(range(2, PARTS))

    # third run: nothing left to do
    assert run_kg_job(N, resumed, num_partitions=PARTS) == []

    # byte-level equivalence of the quad sets
    pd.testing.assert_frame_equal(_read_all(clean), _read_all(resumed))


def test_manifest_metrics_recorded(ray_session, tmp_path):
    out = str(tmp_path / "job")
    rows = run_kg_job(60, out, num_partitions=3)
    assert all(r["n_triples_out"] > 0 and r["wall_ms"] > 0 for r in rows)
    assert os.path.exists(os.path.join(out, "manifest.jsonl"))
