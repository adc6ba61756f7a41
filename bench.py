"""geograft benchmark — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N}

--scaling: runs the same bench in fresh processes at two parallelism
levels (default N=2 and 4N=8; override with GRAFT_SCALING_LO/HI) on the
same deterministically-derived input and reports throughput at both
plus scaling efficiency (the sandbox evidence for the north rule's
two-cluster-size criterion — see BASELINE.md for the full analysis,
including the 8->32 memory-bandwidth-saturation regime).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _pipelines():
    import pyarrow as pa

    from geograft import fixtures as FX
    from geograft.io import read_parquet_sized
    from geograft import ops, pipeline, synth

    def q_extract_tiles():
        # flagship: events -> interleaved docs -> span explode -> geo parse
        # -> owner cells -> cell directory
        docs = read_parquet_sized(f"{SF_DIR}/events.parquet").map_batches(
            synth.docs_from_events, batch_format="pyarrow", batch_size=None
        )
        geoms = ops.extract_geometries(docs)
        return ops.cell_directory(geoms, level=6, bounds=FX.POINTS_BOUNDS).count()

    def q_spatial_join():
        return ops.spatial_join(
            FX.join_left_ds(SF_DIR), FX.join_right_ds(SF_DIR), level=4, bounds=FX.JOIN_BOUNDS
        ).count()

    def q_self_join():
        # lineitem-rect self join, each unordered pair once (the
        # dedicated self-join replicates the table once and filters
        # a<b inside the cell task)
        return ops.spatial_self_join(
            FX.rects_ds(SF_DIR), level=5, bounds=FX.RECTS_BOUNDS
        ).count()

    state = {}

    def q_build_index():
        # full partitioned index build (shuffle + per-cell parquet +
        # manifest with lineage) — the build-once half of
        # build-once/query-many; the manifest doubles as the planner
        # directory for the query stage below
        import shutil

        idx = f"/tmp/geograft_bench_idx_{NUM_CPUS}"
        shutil.rmtree(idx, ignore_errors=True)
        man = pipeline.build_partitioned_index(
            FX.points_ds(SF_DIR), idx, base_level=5, bounds=FX.POINTS_BOUNDS,
            target_rows=500_000,
        )
        state["dir"] = pipeline.directory_from_manifest(man)
        return man["built_cells"]

    KNN_QN = 20000

    def q_knn():
        # build-once/query-many fast path: shuffle-free kNN over the
        # index built by q_build_index (pruned partition reads only)
        import numpy as np

        from geograft import state as ST

        rng = np.random.default_rng(42)
        qn = KNN_QN
        q = pa.table(
            {
                "qid": np.arange(qn),
                "x": rng.uniform(0, 560, qn),
                "y": rng.uniform(0, 1500, qn),
            }
        )
        idx = f"/tmp/geograft_bench_idx_{NUM_CPUS}"
        return len(ST.knn_on_index(idx, q, k=10))

    def q_knn_adhoc():
        # no prebuilt index: two-level kNN with one co-shuffle
        import numpy as np

        rng = np.random.default_rng(43)
        qn = 5000
        q = pa.table(
            {
                "qid": np.arange(qn),
                "x": rng.uniform(0, 560, qn),
                "y": rng.uniform(0, 1500, qn),
            }
        )
        return len(
            ops.indexed_knn(
                FX.points_ds(SF_DIR), q, k=10, level=5, bounds=FX.POINTS_BOUNDS,
                directory=state.get("dir"),
            )
        )

    def q_envelope_scan():
        # 200 batched envelope queries in one pass
        import numpy as np

        rng = np.random.default_rng(7)
        nq = 200
        bx = rng.uniform(0, 100000, nq)
        by = rng.uniform(0, 80, nq)
        boxes = pa.table(
            {
                "box_id": np.arange(nq),
                "minx": bx, "miny": by,
                "maxx": bx + 2000.0, "maxy": by + 10.0,
            }
        )
        return ops.locate_in_envelope_multi(FX.rects_ds(SF_DIR), boxes).count()

    # ---- training-data (LLM) ops: the likely 100-TB workload ------------
    from geograft import annops as A
    from geograft import eventops as EV
    from geograft import textops as T

    def _docs():
        return read_parquet_sized(f"{SF_DIR}/documents.parquet",
                                  columns=["doc_id", "text"])

    def q_dedup_exact():
        return T.dedup_exact(_docs()).count()

    def q_neardup_minhash():
        return T.neardup_minhash(_docs(), tau=0.8).count()

    def q_jaccard_pairs():
        return T.jaccard_pairs_exact(_docs(), tau=0.5).count()

    ANN_QN = 64

    def q_ann_topk():
        import pyarrow.parquet as pq_

        q = pq_.read_table(f"{SF_DIR}/embeddings.parquet").slice(0, ANN_QN)
        qv = A._emb_matrix(q)
        emb = read_parquet_sized(f"{SF_DIR}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
        return len(A.cosine_topk(emb, qv, k=10))

    def q_asof():
        out = EV.asof_join(
            read_parquet_sized(f"{SF_DIR}/events.parquet",
                               columns=["event_id", "ts", "user_id"]),
            read_parquet_sized(f"{SF_DIR}/orders.parquet",
                               columns=["o_custkey", "o_orderdate"]),
            left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate",
            right_cols=["o_orderdate"],
        )
        return out.count()

    pipes = {
        "extract_tiles": q_extract_tiles,
        "spatial_join": q_spatial_join,
        "self_join": q_self_join,
        "build_index": q_build_index,
        "knn": q_knn,
        "knn_adhoc": q_knn_adhoc,
        "envelope_scan": q_envelope_scan,
        "dedup_exact": q_dedup_exact,
        "neardup_minhash": q_neardup_minhash,
        "jaccard_pairs": q_jaccard_pairs,
        "ann_cosine_topk": q_ann_topk,
        "asof_join": q_asof,
    }
    pipes["__knn_qn__"] = KNN_QN
    return pipes


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.WARNING)

    # warm the page cache so we measure compute + shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ("events", "lineitem", "supplier", "part",
              "documents", "embeddings", "orders"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    # warm-up lap (untimed): spawns the worker pool and imports numpy/
    # pyarrow in every worker so the timed lap measures steady-state
    # throughput, not cold-start (which scales with num_cpus, not data).
    if os.environ.get("GRAFT_BENCH_WARMUP", "1") == "1":
        warm = _pipelines()
        warm.pop("__knn_qn__", None)
        w_only = os.environ.get("GRAFT_BENCH_ONLY")
        if w_only:
            w_keep = set(w_only.split(","))
            warm = {k: v for k, v in warm.items() if k in w_keep}
        for fn in warm.values():
            fn()

    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    concurrent = os.environ.get("GRAFT_BENCH_CONCURRENT", "0") == "1"
    times = {}
    raw_times = {}
    rows = {}
    pipes = _pipelines()
    knn_qn = pipes.pop("__knn_qn__")
    only = os.environ.get("GRAFT_BENCH_ONLY")
    if only:
        # subset runs (e.g. the flagship-only scaling laps); sets that
        # include `knn` must also include `build_index` (knn reads the
        # index build_index writes)
        keep = set(only.split(","))
        pipes = {k: v for k, v in pipes.items() if k in keep}
    suite_wall = None
    if concurrent:
        # Cluster-utilization regime: all pipelines share the cluster at
        # once, so one pipeline's shuffle-barrier / planning gaps are
        # filled by another's tasks — how a multi-stage production
        # workload actually occupies a fixed-size cluster. build_index
        # runs FIRST (knn reads the index it writes); everything else is
        # concurrent. Per-pipeline walls overlap and are reported for
        # shape only; the suite wall is the metric.
        from concurrent.futures import ThreadPoolExecutor

        # modules Ray Data imports lazily inside read_parquet etc. —
        # pre-import on the main thread (concurrent first-imports of a
        # partially-initialized module race in CPython)
        try:
            import fsspec.implementations.http  # noqa: F401
        except ImportError:
            pass
        import pandas  # noqa: F401
        import polars  # noqa: F401

        def timed(item):
            name, fn = item
            t0 = time.perf_counter()
            n = fn()
            return name, time.perf_counter() - t0, n

        # Longest-first, bounded pool: a streaming-executor driver loop
        # is pure Python, so N concurrent loops serialize on the GIL —
        # cap the in-flight executions and start the long pipelines
        # first so the tail is short stragglers, not one starved giant.
        LONGEST_FIRST = [
            "jaccard_pairs", "neardup_minhash", "self_join", "knn_adhoc",
            "extract_tiles", "asof_join", "knn", "dedup_exact",
            "envelope_scan", "ann_cosine_topk", "spatial_join",
        ]
        workers = int(os.environ.get("GRAFT_BENCH_CONC_WORKERS", "4"))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            first = []
            if "build_index" in pipes:
                first.append(timed(("build_index", pipes["build_index"])))
            order = [n for n in LONGEST_FIRST if n in pipes] + \
                [n for n in pipes if n != "build_index" and n not in LONGEST_FIRST]
            rest = [(n, pipes[n]) for n in order]
            with ThreadPoolExecutor(max_workers=workers) as pool:
                results = list(pool.map(timed, rest))
            wall = time.perf_counter() - t0
            if best is None or wall < best:
                best = wall
                for name, dt, n in results + first:
                    times[name] = round(dt, 3)
                    raw_times[name] = max(dt, 1e-9)
                    rows[name] = n
        suite_wall = round(best, 3)
        sys.stderr.write(f"# suite (concurrent): {suite_wall}s\n")
        for name in pipes:
            sys.stderr.write(f"# {name}: {times[name]}s (rows={rows[name]}, overlapped)\n")
    else:
        for name, fn in pipes.items():
            best, n = None, None
            for _ in range(reps):
                t0 = time.perf_counter()
                n = fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 3)
            raw_times[name] = max(best, 1e-9)
            rows[name] = n
            sys.stderr.write(f"# {name}: {times[name]}s (rows={n})\n")
    ray.shutdown()
    # north-rule throughputs: docs/sec through the interleaved-doc
    # pipeline, join pairs/sec, kNN queries/sec
    import pyarrow.dataset as pads

    n_events = pads.dataset(f"{SF_DIR}/events.parquet").count_rows()
    n_docs = pads.dataset(f"{SF_DIR}/documents.parquet").count_rows()
    thr_all = {
        "extract_docs_per_sec": ("extract_tiles", lambda t: n_events / t),
        "self_join_pairs_per_sec": ("self_join", lambda t: rows["self_join"] / t),
        "knn_queries_per_sec": ("knn", lambda t: knn_qn / t),
        "dedup_docs_per_sec": ("dedup_exact", lambda t: n_docs / t),
        "minhash_docs_per_sec": ("neardup_minhash", lambda t: n_docs / t),
        "asof_rows_per_sec": ("asof_join", lambda t: n_events / t),
    }
    thr = {k: round(f(raw_times[q]), 1)
           for k, (q, f) in thr_all.items() if q in raw_times}
    return {
        "metric": "geograft headline pipelines wall-clock",
        "value": suite_wall if suite_wall is not None else round(sum(times.values()), 3),
        "unit": "sec",
        "mode": "concurrent" if suite_wall is not None else "serial",
        "queries": times,
        "throughput": thr,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def ensure_scaled_input(src_dir: str, mult: int,
                        doc_mult: int | None = None,
                        emb_mult: int | None = None) -> str:
    """Deterministically derive a `mult`-times-larger events table (other
    tables symlinked) so the scaling measurement runs at a data size
    where compute dominates per-stage fixed costs — the regime the
    two-cluster-size criterion is about. Same input for both levels.

    documents/embeddings get their own (larger) multiplier: the source
    tables are 20x smaller than events, so the training-data ops need
    extra replicas before their compute dominates fixed stage costs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if doc_mult is None:
        doc_mult = int(os.environ.get("GRAFT_SCALING_DOC_MULT", str(4 * mult)))
    if emb_mult is None:
        emb_mult = int(os.environ.get("GRAFT_SCALING_EMB_MULT", str(4 * mult)))
    out_dir = (f"/tmp/geograft_scaling_{os.path.basename(src_dir)}"
               f"_x{mult}_d{doc_mult}_e{emb_mult}")
    marker = os.path.join(out_dir, ".done")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(os.path.join(src_dir, "events.parquet"))
    cols = {c: src.column(c) for c in src.column_names}
    eid = cols["event_id"].to_numpy()
    val = cols["value"].to_numpy()
    # one file per replica -> parallel read tasks (Ray parallelizes
    # parquet reads per file); at real scale inputs are many files anyway
    ev_dir = os.path.join(out_dir, "events.parquet")
    os.makedirs(ev_dir, exist_ok=True)
    for r in range(mult):
        t = {c: cols[c] for c in src.column_names}
        t["event_id"] = pa.array(eid + r * 10_000_000)
        t["value"] = pa.array(np.round(val + r * 0.001, 6))
        pq.write_table(pa.table(t), os.path.join(ev_dir, f"part-{r:03d}.parquet"))
    # lineitem: same rows, split into files so reads parallelize
    li = pq.read_table(os.path.join(src_dir, "lineitem.parquet"))
    li_dir = os.path.join(out_dir, "lineitem.parquet")
    os.makedirs(li_dir, exist_ok=True)
    n_li_files = 8
    step = -(-li.num_rows // n_li_files)
    for i in range(n_li_files):
        pq.write_table(li.slice(i * step, step),
                       os.path.join(li_dir, f"part-{i:03d}.parquet"))
    # documents: mult replicas with per-replica unique doc_ids; a
    # replica marker is FUSED onto every token (suffix, not a new
    # token!) so replicas share ZERO shingles while each replica's
    # shingle document-frequency distribution matches the original
    # corpus exactly — work scales linearly in mult. (Inserting marker
    # TOKENS instead creates `marker word marker` unigram shingles
    # shared by thousands of docs: the O(df^2) hot-shingle blowup.)
    docs = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    d_ids = docs.column("doc_id").to_numpy()
    d_txt = docs.column("text").combine_chunks().cast(pa.string())
    doc_dir = os.path.join(out_dir, "documents.parquet")
    os.makedirs(doc_dir, exist_ok=True)
    import pyarrow.compute as pc

    for r in range(doc_mult):
        t = {c: docs.column(c) for c in docs.column_names}
        t["doc_id"] = pa.array(d_ids + r * 10_000_000)
        t["text"] = pc.binary_join_element_wise(
            pc.replace_substring(d_txt, " ", f"q{r} "), f"q{r}", ""
        )
        pq.write_table(pa.table(t), os.path.join(doc_dir, f"part-{r:03d}.parquet"))
    # embeddings: mult replicas, ids offset, first component nudged
    emb = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    e_ids = emb.column("vec_id").to_numpy()
    emb_dir = os.path.join(out_dir, "embeddings.parquet")
    os.makedirs(emb_dir, exist_ok=True)
    flat = emb.column("embedding").combine_chunks().flatten().to_numpy(
        zero_copy_only=False).astype(np.float32)
    d = len(flat) // len(e_ids)
    for r in range(emb_mult):
        fl = flat.copy()
        fl[0::d] += np.float32(r) * np.float32(0.01)
        t = {c: emb.column(c) for c in emb.column_names}
        t["vec_id"] = pa.array(e_ids + r * 10_000_000)
        t["embedding"] = pa.ListArray.from_arrays(
            pa.array(np.arange(0, len(fl) + 1, d, dtype=np.int32)), pa.array(fl)
        )
        pq.write_table(pa.table(t), os.path.join(emb_dir, f"part-{r:03d}.parquet"))
    for t in ("supplier", "part", "orders", "customer", "region", "nation"):
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src_dir, f"{t}.parquet"), dst)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def run_scaling() -> dict:
    """Two-part protocol (full analysis in BASELINE.md):

    1. CRITERION — the HEADLINE pipeline (extract_tiles: events ->
       interleaved docs -> span parse -> cell directory) on an input
       large enough that compute dominates per-stage fixed costs
       (events x GRAFT_SCALING_MULT, default 180 — re-sized each round so the @2 lap runs ~30-40 s, amortizing per-process fixed costs the way a long-running cluster job would; x60 fell to 11 s @2 after the round-4 vectorized directory combine and fixed costs dominated), at num_cpus lo and
       hi in fresh processes, GRAFT_SCALING_PAIRS interleaved pairs,
       per-level minimum. Reported as `scaling_efficiency`.
    2. TRANSPARENCY — the full 12-pipeline suite run SERIALLY once per
       level on a moderately scaled input; per-pipeline speedups
       reported as `suite_*`. Serially summing 12 short pipelines
       accumulates 12 sets of shuffle-barrier latencies that a real
       100-TB run would amortize (each pipeline runs for hours, not
       seconds), so the aggregate ratio UNDERSTATES pipeline-structure
       scaling — reported anyway, with per-pipeline detail.
    """
    mult = int(os.environ.get("GRAFT_SCALING_MULT", "180"))
    suite_mult = int(os.environ.get("GRAFT_SCALING_SUITE_MULT", "10"))
    flag_dir = ensure_scaled_input(SF_DIR, mult, doc_mult=1, emb_mult=1)
    suite_dir = ensure_scaled_input(SF_DIR, suite_mult)
    flagship = os.environ.get("GRAFT_SCALING_FLAGSHIP", "extract_tiles")

    def run(ncpu: int, sf_dir: str, only: str | None = None,
            warmup: str = "1") -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
                   GRAFT_BENCH_REPS="1", GRAFT_BENCH_CONCURRENT="0",
                   GRAFT_BENCH_WARMUP=warmup)
        if only:
            env["GRAFT_BENCH_ONLY"] = only
        else:
            env.pop("GRAFT_BENCH_ONLY", None)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Default N=2 -> 4N=8: the regime where the host's shared memory bus
    # is not yet saturated, so the measurement reflects the PIPELINE's
    # parallel structure (the thing the two-cluster-size criterion is
    # about) rather than single-box bandwidth limits. 8->32 numbers and
    # the saturation analysis are recorded in BASELINE.md.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "8"))
    # alternate the two levels and keep the per-level MINIMUM: background
    # load on this shared box only ever adds time, and alternating cancels
    # slow phases hitting one level disproportionately
    pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "3"))
    runs_lo, runs_hi = [], []
    for _ in range(pairs):
        runs_lo.append(run(lo, flag_dir, only=flagship))
        runs_hi.append(run(hi, flag_dir, only=flagship))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    speedup = r_lo["value"] / r_hi["value"]
    # Achievable speedup is capped by the host's core count: on a box
    # with >= hi cores this reduces to the standard (t_lo/t_hi)/(hi/lo);
    # on a smaller host efficiency is measured against what the hardware
    # can actually deliver.
    phys = os.cpu_count() or 1
    achievable = max(1.0, min(hi / lo, phys / lo))
    eff = speedup / achievable

    # one serial suite pair for the per-pipeline table
    s_lo = run(lo, suite_dir, warmup="0")
    s_hi = run(hi, suite_dir, warmup="0")
    suite_speedups = {
        q: round(s_lo["queries"][q] / max(s_hi["queries"][q], 1e-9), 2)
        for q in s_lo["queries"]
    }
    return {
        "metric": (f"headline-pipeline scaling efficiency "
                   f"(num_cpus {lo} -> {hi}, fresh processes, same input)"),
        "flagship": flagship,
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        "speedup": round(speedup, 3),
        f"all_runs_{lo}": [r["value"] for r in runs_lo],
        f"all_runs_{hi}": [r["value"] for r in runs_hi],
        "physical_cores": phys,
        "achievable_speedup": achievable,
        "scaling_efficiency": round(eff, 3),
        "flagship_input": flag_dir,
        "flagship_mult": mult,
        f"suite_sec_{lo}": s_lo["value"],
        f"suite_sec_{hi}": s_hi["value"],
        f"suite_queries_{lo}": s_lo["queries"],
        f"suite_queries_{hi}": s_hi["queries"],
        "suite_speedups": suite_speedups,
        "suite_speedup_total": round(s_lo["value"] / max(s_hi["value"], 1e-9), 3),
        "suite_input": suite_dir,
        "suite_mult": suite_mult,
        "sf": SF_DIR,
    }


def run_textlap() -> dict:
    """2 M-doc text-family lap: dedup_exact / neardup_minhash /
    jaccard_pairs over documents x GRAFT_TEXTLAP_DOC_MULT (default 400
    -> 2 M docs from sf0.1's 5k) in a fresh process at NUM_CPUS — the
    evidence that the dedup family survives a 10x corpus jump past the
    200k-doc suite input (candidate volume grows superlinearly with
    vocabulary density: measure, don't extrapolate). Also reports the
    bucket count the coarse exchanges choose at this size and which
    exchange (direct vs sort) the size gate picks."""
    doc_mult = int(os.environ.get("GRAFT_TEXTLAP_DOC_MULT", "400"))
    lap_dir = ensure_scaled_input(SF_DIR, 1, doc_mult=doc_mult, emb_mult=1)
    env = dict(os.environ, RAY_GRAFT_CPUS=str(NUM_CPUS), GRAFT_SF_DIR=lap_dir,
               GRAFT_BENCH_REPS="1", GRAFT_BENCH_CONCURRENT="0",
               GRAFT_BENCH_ONLY="dedup_exact,neardup_minhash,jaccard_pairs",
               GRAFT_BENCH_WARMUP="0")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    r = json.loads(out.strip().splitlines()[-1])
    # the knob values those pipelines' exchanges actually derive at
    # this input size (plan-metadata only, nothing executes)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    from geograft.io import read_parquet_sized
    from geograft.ops import (DIRECT_EXCHANGE_MAX_BYTES,
                              DIRECT_EXCHANGE_MIN_BYTES)
    from geograft.scale import input_bytes_estimate, shuffle_buckets

    docs = read_parquet_sized(f"{lap_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    est = input_bytes_estimate(docs)
    nb = shuffle_buckets(docs)
    ray.shutdown()
    import pyarrow.dataset as pads

    return {
        "metric": "text-family lap (dedup/minhash/jaccard)",
        "docs": pads.dataset(f"{lap_dir}/documents.parquet").count_rows(),
        "doc_mult": doc_mult,
        "queries": r["queries"],
        "value": round(sum(r["queries"].values()), 3),
        "unit": "sec",
        "shuffle_buckets": nb,
        "docs_inmem_bytes_est": est,
        "exchange": ("direct" if est is not None
                     and DIRECT_EXCHANGE_MIN_BYTES <= est
                     <= DIRECT_EXCHANGE_MAX_BYTES else "sort"),
        "num_cpus": NUM_CPUS,
        "input": lap_dir,
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--textlap" in sys.argv:
        print(json.dumps(run_textlap()))
    else:
        print(json.dumps(run_bench()))
