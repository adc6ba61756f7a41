"""Per-stage throughput metrics (geograft.metrics).

The reference library has no runtime-metrics surface (single process);
the distributed engine's contract is: every pipeline can report
per-stage wall time / rows / throughput from Ray Data's own execution
stats, and the index manifest carries them alongside the per-partition
lineage records.
"""
from __future__ import annotations

import json
import os

import pytest

from geograft import metrics


def test_stage_metrics_multi_stage(ray_session):
    import ray.data as rd

    ds = (rd.range(50_000)
          .map_batches(lambda b: b, batch_format="pyarrow")
          .groupby("id").count()
          .materialize())
    recs = metrics.stage_metrics(ds)
    assert len(recs) >= 2  # read/map upstream + aggregate
    total_out = [r for r in recs if r["output_rows"] == 50_000]
    assert total_out, recs
    for r in recs:
        assert r["elapsed_s"] >= 0
        assert set(r) == {"stage", "elapsed_s", "task_busy_s", "udf_s",
                          "output_rows", "output_bytes", "rows_per_sec"}


def test_stage_metrics_unexecuted_is_empty(ray_session):
    import ray.data as rd

    ds = rd.range(10)  # lazy, never executed
    assert metrics.stage_metrics(ds) in ([], metrics.stage_metrics(ds))


def test_run_with_metrics_sidecar(ray_session, tmp_path):
    import ray.data as rd

    side = str(tmp_path / "stages.json")
    ds, report = metrics.run_with_metrics(
        lambda: rd.range(10_000).map_batches(
            lambda b: b, batch_format="pyarrow"),
        sidecar=side,
    )
    assert report["rows"] == 10_000
    assert report["wall_s"] > 0 and report["rows_per_sec"] > 0
    assert os.path.exists(side)
    with open(side) as f:
        on_disk = json.load(f)
    assert on_disk["rows"] == 10_000
    assert isinstance(on_disk["stages"], list)


def test_manifest_carries_stage_metrics(ray_session, tmp_path, sf_small):
    """build_partitioned_index persists a 'stages' key next to the
    per-partition lineage (best-effort: empty when the small-input
    direct exchange bypasses Ray Data stats, populated on the sort
    path every large build takes)."""
    from geograft import fixtures as FX
    from geograft import pipeline

    man = pipeline.build_partitioned_index(
        FX.points_ds(sf_small), str(tmp_path / "idx"), base_level=2,
        bounds=FX.POINTS_BOUNDS, target_rows=10_000)
    assert "stages" in man
    assert isinstance(man["stages"], list)
    with open(tmp_path / "idx" / "_manifest.json") as f:
        assert "stages" in json.load(f)
