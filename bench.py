"""Benchmark harness.

Default mode — the driver's per-round benchmark:
    python bench.py
  * builds the full KG pipeline over a deterministic synthetic source table
    (reference fixtures replicated across N repos, FIXTURES.md §5) and
    measures end-to-end files/sec
  * runs the catalog's headline queries at $SPARK_GRAFT_SF_DIR (default
    /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
  * prints ONE JSON line {"metric", "value", "unit": "sec", "queries", "sf"}

Scaling mode — the north rule's two-cluster-size evidence:
    python bench.py --scaling
  runs the identical KG build at local[8] and local[32] (subprocesses; one
  JVM each) and writes BENCH/BASELINE.md with throughput at both levels and
  efficiency = (rate32/rate8)/4 (target >= 0.8, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
COPIES = int(os.environ.get("SPARK_GRAFT_BENCH_COPIES", "12"))

# headline list: every throughput-representative catalog query, including
# the heaviest embed-path one (ann_docs_embed — VERDICT r05 #4).  graph_bfs
# stays excluded deliberately: it is per-job fixed cost on a 500-row graph
# (commit 6e0a584), not a throughput signal.
BENCH_QUERIES = ["doc_stats", "dedup_exact", "minhash_pairs", "simhash",
                 "quality_score", "ann_best_neighbor", "ann_lsh_best",
                 "ann_ivf_best", "ann_docs_embed", "ngram_jaccard",
                 "doc_fulltext", "link_cascade_resolve", "link_path_match",
                 "link_library_uses", "pricing_summary", "top_nation_revenue",
                 "event_sessions"]


DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")


def make_spark(cpus: int, files: int | None = None):
    from pyspark.sql import SparkSession

    # shuffle partitions scale with the DATA, clamped to [cpus, 4*cpus]:
    # up to 4 waves per shuffle stage so per-task variance can't idle the
    # other cores for a whole one-wave tail (r5 legs: nodes_assembled
    # 0.36-0.41 core-util at cpus partitions), but never more than ~1
    # partition per 300 files — on the 5,928-file default corpus a flat
    # 4*cpus=128 put 128 near-empty tasks on EVERY one of ~800 stages and
    # fixed scheduling costs dominated (measured 30-42 files/sec vs 76
    # at 32 partitions, task-concurrency util 0.615, 32% planning gaps).
    # The big legs are unaffected: >=9.6k files saturates the 4*cpus cap
    # at local[8] (the 345.8k-file record pairs ran at exactly this value).
    if files:
        shuf = max(cpus, min(4 * cpus, files // 300))
    else:
        shuf = 4 * cpus
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("stakgraph-spark-bench")
            .config("spark.driver.memory", DRIVER_MEM)
            .config("spark.sql.shuffle.partitions",
                    os.environ.get("SPARK_GRAFT_SHUF") or str(shuf))
            .config("spark.sql.adaptive.enabled", "true")
            # keep post-shuffle parallelism at the core count: with the
            # default 64 MB advisory size AQE coalesces the link plane's
            # small shuffles to 1-2 partitions, idling every core past the
            # second (measured: the local[8] link plane ran barely 1.3x
            # local[2] at 144k files)
            .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                    "true")
            # 128k on big corpora (not the 1m default): post-surrogate
            # link-plane rows are ~16-byte keys with 50+ µs/row of codegen —
            # byte-targeted coalescing at 1m built 5 x 170k-row pieces that
            # ran 14 s each while the other cores idled (event-log stage
            # 556, r6).  On SMALL corpora the tradeoff inverts: per-task
            # fixed costs dominate tiny pieces (5.9k files: 67 files/sec at
            # 1m vs 61 at 128k, interleaved A/B), so scale with the data.
            .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                    "128k" if (files or 10**9) >= 30000 else "1m")
            .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
            .config("spark.rdd.compress", "true")
            # big symbol-table lookup sides must NOT broadcast: the driver
            # builds broadcast hash tables single-threaded, a serial cost
            # that grows with the corpus (measured L ~ 217 s at 144k files)
            .config("spark.sql.autoBroadcastJoinThreshold",
                    os.environ.get("SPARK_GRAFT_BCAST", "10m"))
            .config("spark.ui.enabled", "false")
            # constraint propagation is O(constraints x columns) per plan and
            # the link plane's post-checkpoint plans carry hundreds of
            # columns through dozens of joins; event-log analysis showed
            # 71 s of the 214 s cold wall (33%) with NO stage running —
            # driver-only Catalyst time.  Disabling it cut the cold leg
            # 207 -> 145 s and the warm leg 144 -> 134 s at 49.4k files with
            # identical output (it only infers redundant IsNotNull/filters
            # that our explicit join conditions already carry).
            .config("spark.sql.constraintPropagation.enabled", "false")
            # diagnostics: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" (e.g. event logs
            # for task-level straggler analysis)
            .config(
                map=dict(kv.split("=", 1) for kv in os.environ.get(
                    "SPARK_GRAFT_EXTRA_CONF", "").split(";") if "=" in kv))
            .getOrCreate())


def stage_corpus(spark, copies: int) -> tuple[str, int]:
    """Materialize the synthetic source table to parquet ONCE (untimed) —
    the pipeline's contract input is a table, and driver-side
    createDataFrame serialization must not pollute the measurement."""
    from stakgraph_spark.source import (IMPLEMENTED_FIXTURES,
                                        fixture_source_rows, replicate_rows)
    from stakgraph_spark.schema import SOURCE_SCHEMA

    rows = replicate_rows(fixture_source_rows(IMPLEMENTED_FIXTURES), copies)
    # cache key includes the row count: the fixture set grows as languages
    # are implemented, and a stale corpus would poison cross-round comparisons
    path = f"/tmp/kg_bench_corpus_c{copies}_f{len(rows)}"
    if not os.path.exists(path + "/_SUCCESS"):
        (spark.createDataFrame(rows, SOURCE_SCHEMA)
         .repartition(64).write.mode("overwrite").parquet(path))
    return path, len(rows)


def kg_build_files_sec(spark, copies: int,
                       on_start=None) -> tuple[int, float, dict]:
    """Build the graph over the replicated fixture corpus; -> (files, sec,
    size stats).  `on_start` (if given) fires immediately before
    build_graph, next to the stage-clock anchor — so a caller's CPU/util
    sampler shares the same t=0 as the per-stage timestamps and a cold
    /tmp corpus write can't be misattributed to the earliest stages
    (ADVICE r05)."""
    from stakgraph_spark.pipeline import build_graph

    path, n_files = stage_corpus(spark, copies)
    src = spark.read.parquet(path)
    if on_start is not None:
        on_start()
    t0 = time.time()
    g = build_graph(spark, src)
    nodes = g.nodes.count()
    edges = g.edges.count()
    dt = time.time() - t0
    return n_files, dt, {"nodes": nodes, "edges": edges,
                         "stages": g.metrics}


def run_default() -> dict:
    spark = make_spark(CPUS, files=494 * COPIES)
    spark.sparkContext.setLogLevel("ERROR")
    from stakgraph_spark.textops.catalog import CATALOG

    queries: dict[str, float] = {}
    total = 0.0

    files, dt, stats = kg_build_files_sec(spark, COPIES)
    queries["kg_build"] = round(dt, 3)
    total += dt

    for name in BENCH_QUERIES:
        fn, _ = CATALOG[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        q = time.time() - t0
        queries[name] = round(q, 3)
        total += q

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "kg-pipeline+catalog wall time (kg_build over "
                  f"{files} files => {round(files / dt, 1)} files/sec)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "files": files,
        "files_per_sec": round(files / dt, 1),
        "graph": {"nodes": stats["nodes"], "edges": stats["edges"]},
    }


def run_kg_only(cpus: int, copies: int, reps: int = 1) -> dict:
    """Build the KG `reps` times in ONE JVM; report every rep plus the best.

    Rep 1 is cold (JIT + codegen compile from scratch); later reps are warm —
    the steady state a long-running cluster operates in (generated code and
    JIT output are cached across jobs).  Best-of also defuses host-level CPU
    steal from co-tenant VMs (observed 2x wall-time swings between identical
    runs on this container)."""
    import threading

    spark = make_spark(cpus, files=494 * copies)
    spark.sparkContext.setLogLevel("ERROR")
    runs = []
    files = stats = None
    for _ in range(reps):
        # sample the tree CPU on a timeline so idle can be LOCALIZED to a
        # stage, not just reported as a run-wide fraction (the round-4/5
        # reports could only say "~28% idle somewhere").  The sampler's t=0
        # is anchored INSIDE kg_build_files_sec immediately before
        # build_graph — the same instant as the pipeline's stage clock — so
        # a cold /tmp corpus write is not misattributed to the earliest
        # stages (ADVICE r05).
        samples: list[tuple[float, float]] = []
        stop = threading.Event()
        state: dict = {}

        def _start_sampler():
            state["t0"] = time.time()
            samples.append((0.0, _tree_cpu_sec()))

            def _sampler():
                while not stop.wait(0.5):
                    samples.append((time.time() - state["t0"],
                                    _tree_cpu_sec()))

            state["thr"] = threading.Thread(target=_sampler, daemon=True)
            state["thr"].start()

        files, dt, stats = kg_build_files_sec(spark, copies,
                                              on_start=_start_sampler)
        cpu = _tree_cpu_sec() - samples[0][1]
        stop.set()
        state["thr"].join(timeout=2)
        runs.append({"sec": round(dt, 3),
                     "files_per_sec": round(files / dt, 2),
                     "cpu_sec": round(cpu, 1),
                     "core_util": round(cpu / (dt * cpus), 3),
                     "stages": stats["stages"],
                     "stage_util": _stage_util(stats["stages"], samples,
                                               cpus)})
        # release this rep's localCheckpoint RDD blocks SYNCHRONOUSLY before
        # the next rep — ContextCleaner's async unpersist lagged into the
        # next rep's extraction (rep-2 nodes_assembled ran 1.2-1.6x rep 1 at
        # 0.36-0.41 core-util in the r5 legs while old blocks squatted in
        # the storage pool)
        from stakgraph_spark.ckpt import release_all
        release_all()
        import gc
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    best = max(runs, key=lambda r: r["files_per_sec"])
    return {"cpus": cpus, "files": files, "sec": best["sec"],
            "files_per_sec": best["files_per_sec"], "runs": runs,
            "nodes": stats["nodes"], "edges": stats["edges"],
            "stages": best["stages"]}


def _stage_util(stages: list[dict], samples: list[tuple[float, float]],
                cpus: int) -> list[dict]:
    """Per-stage core utilization from the sampled (elapsed, tree-CPU)
    timeline: for each stage span [prev_t, t) interpolate the CPU counter at
    the boundaries and divide the burn by the span's core-seconds.  The
    sampler and the pipeline's stage clock start within ~ms of each other
    (both anchored right before build_graph), so boundary skew is bounded by
    one sample interval."""
    if len(samples) < 2:
        return []

    def cpu_at(t: float) -> float:
        lo = samples[0]
        for s in samples:
            if s[0] >= t:
                hi = s
                if hi[0] == lo[0]:
                    return hi[1]
                w = (t - lo[0]) / (hi[0] - lo[0])
                return lo[1] + w * (hi[1] - lo[1])
            lo = s
        return samples[-1][1]

    out = []
    prev = 0.0
    for st in stages:
        t = st["t"]
        span = t - prev
        if span > 0.5:  # sub-sample spans carry no signal
            burn = cpu_at(t) - cpu_at(prev)
            out.append({"stage": st["stage"], "dt": round(span, 1),
                        "util": round(burn / (span * cpus), 3)})
        prev = t
    return out


def _hw_burn(n):  # module-level: must be picklable for mp.Pool
    import hashlib
    h = hashlib.md5()
    s = b"x" * 4096
    for _ in range(n):
        h.update(s)


def _hw_burn_rand(seed):
    """Random-gather working set — the memory-access shape of hash joins /
    shuffles.  This is the calibration that actually predicts the
    pipeline's scaling ceiling: sequential-bandwidth and cache-resident
    compute both scale ~3.9x/4x on this container, random access does not
    (measured 2.87x at round 4)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    a = np.arange(16 * 1024 * 1024, dtype=np.int64)   # 128 MB
    idx = rng.randint(0, a.size, 4 * 1024 * 1024)
    s = 0
    for _ in range(12):
        s += int(a[idx].sum())
    return s


def _pin_init(mask_n):  # pool initializer: same affinity regime as the legs
    os.sched_setaffinity(0, set(range(mask_n)))


def hw_calibration(levels: tuple[int, int]) -> dict:
    """Measured scaling ceilings of THIS machine between the two worker
    counts, for two workload shapes: cache-resident compute (md5 loop) and
    random-gather memory access (the hash-join/shuffle shape).  The
    pipeline's efficiency is reported raw AND relative to both.

    Under SPARK_GRAFT_PIN=1 each calibration pool is pinned to the same
    0..N-1 core mask its pipeline leg runs under (ADVICE r04: an unpinned
    calibration measures a different affinity regime than the efficiency it
    normalizes)."""
    import multiprocessing as mp

    pin = bool(os.environ.get("SPARK_GRAFT_PIN"))

    def _pool(workers):
        if pin:
            return mp.Pool(workers, initializer=_pin_init,
                           initargs=(workers,))
        return mp.Pool(workers)

    def rate(workers, n=150_000):
        with _pool(workers) as p:
            t0 = time.time()
            p.map(_hw_burn, [n] * workers)
            return workers * n / (time.time() - t0)

    def rate_rand(workers):
        with _pool(workers) as p:
            t0 = time.time()
            p.map(_hw_burn_rand, list(range(workers)))
            return workers / (time.time() - t0)

    r1 = max(rate(levels[0]) for _ in range(2))
    r2 = max(rate(levels[1]) for _ in range(2))
    g1 = max(rate_rand(levels[0]) for _ in range(2))
    g2 = max(rate_rand(levels[1]) for _ in range(2))
    span = levels[1] / levels[0]
    # keys embed the actual worker counts so the persisted artifact stays
    # self-describing for arbitrary (lo, hi) level pairs, not just 1:4
    return {f"rate_{levels[0]}w": r1, f"rate_{levels[1]}w": r2,
            "levels": list(levels),
            "hw_ratio": round(r2 / r1, 3),
            "hw_ceiling": round((r2 / r1) / span, 3),
            "randmem_ratio": round(g2 / g1, 3),
            "randmem_ceiling": round((g2 / g1) / span, 3)}


def _tree_cpu_sec() -> float:
    """utime+stime+cutime+cstime of this process and every descendant (JVM,
    python workers) — the serial-fraction detector: if the pipeline's CPU
    burn is ~= wall x cores at the high leg, no driver serial section is
    hiding.  cutime/cstime (stat fields 16/17) matter: Spark reaps idle
    python workers after the extraction stage, and a reaped child's CPU
    vanishes from the live-descendant sum but folds into its parent's
    cutime — without them the r6 pair-2 legs reported NEGATIVE
    nodes_assembled utilization (the counter went backwards as ~30 workers
    died).  No double count: cutime only includes waited-on children."""
    me = os.getpid()
    procs = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            procs[int(p)] = (int(parts[1]),
                             int(parts[11]) + int(parts[12])
                             + int(parts[13]) + int(parts[14]))
        except OSError:
            continue
    desc = {me}
    grew = True
    while grew:
        grew = False
        for pid, (ppid, _) in procs.items():
            if ppid in desc and pid not in desc:
                desc.add(pid)
                grew = True
    return sum(procs[p][1] for p in desc if p in procs) / 100.0


def gate_calibration(levels: tuple[int, int],
                     lo: float = 0.48, hi: float = 1.05,
                     max_probes: int = 20, sleep_s: int = 60) -> list[float]:
    """Round-5 protocol, now in code: launch a scaling pair only after TWO
    consecutive random-gather calibration probes land in [lo, hi] — a probe
    outside the band means a co-tenant is squatting on the memory system
    and the pair would measure the neighbor, not the pipeline (the excluded
    r5 run's own calibration read 0.366 and one rep's cascade stage ran at
    0.08 core-util).  Returns the accepted probe values; raises after
    max_probes so an unusable window fails loudly instead of burning hours."""
    import multiprocessing as mp

    pin = bool(os.environ.get("SPARK_GRAFT_PIN"))

    def probe() -> float:
        vals = []
        for workers in levels:
            if pin:
                p = mp.Pool(workers, initializer=_pin_init, initargs=(workers,))
            else:
                p = mp.Pool(workers)
            with p:
                t0 = time.time()
                p.map(_hw_burn_rand, list(range(workers)))
                vals.append(workers / (time.time() - t0))
        span = levels[1] / levels[0]
        return round((vals[1] / vals[0]) / span, 3)

    ok: list[float] = []
    for i in range(max_probes):
        v = probe()
        print(f"# gate probe {i + 1}: randmem ceiling {v}", file=sys.stderr)
        if lo <= v <= hi:
            ok.append(v)
            if len(ok) >= 2:
                return ok
        else:
            ok = []
            time.sleep(sleep_s)
    raise RuntimeError(
        f"calibration gate: no 2 consecutive probes in [{lo}, {hi}] after "
        f"{max_probes} attempts — machine contended, not a usable window")


def run_scaling(copies: int, levels: tuple[int, int] = (2, 8),
                reps: int = 2, tag: str = "",
                hw0: dict | None = None,
                flip_order: bool = False) -> dict:
    os.makedirs("BENCH", exist_ok=True)
    # calibrate FIRST and persist every leg as it lands: a late failure must
    # never lose an hour-long measurement again
    if hw0 is None:
        hw0 = hw_calibration(levels)
    # SPARK_GRAFT_PIN=1 pins each leg's WHOLE process tree (JVM, python
    # workers, GC/compiler threads) to exactly N cores via taskset — the
    # faithful reading of the north rule's "N vs 4N cores".  Unpinned
    # local[N] only bounds concurrent tasks: auxiliary threads free-ride on
    # the machine's other cores, inflating the low leg's rate (measured
    # core_util 1.1 at local[2]) and depressing the reported efficiency.
    pin = bool(os.environ.get("SPARK_GRAFT_PIN"))
    by_cpus = {}
    # flip_order runs the high leg first — alternating leg order across a
    # multi-pair session decorrelates slow co-tenant drift from the
    # leg-order covariate (the r5 single-pair headline was vulnerable to
    # exactly that: a throttled low leg flatters efficiency)
    order = list(reversed(levels)) if flip_order else list(levels)
    for cpus in order:
        cmd = [sys.executable, __file__, "--kg-only", str(cpus), str(copies),
               str(reps)]
        if pin:
            cmd = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=14000)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        by_cpus[cpus] = json.loads(line)
        with open(f"BENCH/leg_local{cpus}_c{copies}{tag}.json", "w") as f:
            f.write(line)
    rn, r4n = by_cpus[levels[0]], by_cpus[levels[1]]
    results = [rn, r4n]
    n1, n2 = levels
    eff = (r4n["files_per_sec"] / rn["files_per_sec"]) / (n2 / n1)
    hw = hw0
    rel = round(eff / hw["hw_ceiling"], 3) if hw["hw_ceiling"] else None
    rel_rand = round(eff / hw["randmem_ceiling"], 3) \
        if hw.get("randmem_ceiling") else None
    hi_util = max(x["core_util"] for x in r4n["runs"]) \
        if r4n["runs"] and "core_util" in r4n["runs"][0] else None
    # narrative must follow the measured number (a round-4 report shipped
    # "the cores are busy" next to a 0.744 utilization): below 0.9 the idle
    # fraction — materialization-barrier tails — is named as such
    if hi_util is None:
        util_note = "(no per-rep CPU accounting available for this run)"
    elif hi_util >= 0.9:
        util_note = (
            "the cores are essentially busy; the residual gap to 1.0 x "
            "ideal is CPU-work inflation under memory contention (total "
            "CPU-sec rises between the two legs for identical input), not "
            "a driver serial section")
    else:
        util_note = (
            f"i.e. ~{round((1 - hi_util) * 100)}% of core-time is IDLE — "
            "materialization-barrier tails (stage-checkpoint stragglers) "
            "plus any scheduler gaps; the rest of the efficiency gap is "
            "CPU-work inflation under memory contention (total CPU-sec "
            "rises between the two legs for identical input)")
    os.makedirs("BENCH", exist_ok=True)
    rep_rows = "\n".join(
        f"| local[{r['cpus']}] rep {i + 1} | {x['sec']} | {x['files_per_sec']} "
        f"| {x.get('cpu_sec', '')} | {x.get('core_util', '')} |"
        for r in results for i, x in enumerate(r["runs"]))
    pin_note = (" — process tree PINNED to N cores via taskset (the "
                "faithful N-vs-4N-cores reading)" if pin else
                " — unpinned local[N] (aux threads free-ride; low leg's "
                "effective cores > N)")
    with open(f"BENCH/scaling_{n1}v{n2}_{rn['files']}{tag}.md", "w") as f:
        f.write(f"""# Scaling run — local[{n1}] vs local[{n2}], {rn['files']} files{pin_note}

| parallelism | files | wall sec (best) | files/sec (best) | nodes | edges |
|---|---|---|---|---|---|
| local[{n1}]  (N)  | {rn['files']} | {rn['sec']} | {rn['files_per_sec']} | {rn['nodes']} | {rn['edges']} |
| local[{n2}] (4N) | {r4n['files']} | {r4n['sec']} | {r4n['files_per_sec']} | {r4n['nodes']} | {r4n['edges']} |

**Scaling efficiency = (rate_4N / rate_N) / {n2 // n1} = {eff:.3f}** (target >= 0.8).

Hardware calibration on THIS machine at run time, two workload shapes:

* cache-resident compute (md5 loop): {hw['hw_ratio']}x of {n2 // n1}x ideal
  = **{hw['hw_ceiling']:.3f} ceiling**
* random-gather memory access (the hash-join/shuffle shape — 128 MB
  working set, random 8-byte gathers): {hw['randmem_ratio']}x of
  {n2 // n1}x ideal = **{hw['randmem_ceiling']:.3f} ceiling** for
  embarrassingly parallel work of the link plane's shape

Pipeline efficiency relative to the compute ceiling: **{rel}**; relative
to the random-access ceiling: **{rel_rand}**.

Serial-fraction check: at local[{n2}] the pipeline's process tree burned
**{hi_util} of (wall x {n2} cores)** (CPU accounting over /proc, incl.
JVM + python workers) — {util_note}.

All reps (rep 1 cold JVM, rep 2+ warm JIT/codegen — the steady state of a
long-running cluster; best-of defuses co-tenant CPU steal):

| run | wall sec | files/sec | cpu sec | core util |
|---|---|---|---|---|
{rep_rows}

Per-stage timings (best runs):

```json
{json.dumps({f'local{n1}': rn['stages'], f'local{n2}': r4n['stages']}, indent=2)}
```
""")
    summary = {"efficiency": round(eff, 3), "levels": levels,
               "pinned": pin, "hw": hw, "efficiency_vs_hw": rel,
               "rn": rn, "r4n": r4n}
    print(json.dumps(summary))
    return summary


def run_scaling_multi(copies: int, levels: tuple[int, int] = (2, 8),
                      pairs: int = 3, reps: int = 2) -> None:
    """VERDICT r05 #2: the efficiency headline must be a MEDIAN of >= `pairs`
    calibration-gated same-run pairs, not one pair whose throttled low leg
    can flatter the number (r5: 0.632 single-pair vs 0.503 conservative).

    Each pair: (a) wait for the calibration gate — two consecutive
    random-gather probes in [0.48, 1.05]; (b) run BOTH legs back-to-back in
    the same window (leg order alternates across pairs to decorrelate
    co-tenant drift); (c) persist the pair's own report + legs.  The summary
    report leads with the median and the full spread."""
    import statistics

    os.makedirs("BENCH", exist_ok=True)
    n1, n2 = levels
    out = []
    gate_failed = 0
    for p in range(pairs):
        try:
            probes = gate_calibration(levels)
        except RuntimeError as e:
            # a pair whose window never calms is SKIPPED, not fatal: the
            # completed gated pairs are the measurement (r6: pair 3's gate
            # saw 20 contended probes and raised, losing the summary for
            # two finished pairs)
            print(f"# pair {p + 1} skipped: {e}", file=sys.stderr)
            gate_failed += 1
            continue
        hw0 = hw_calibration(levels)
        s = run_scaling(copies, levels, reps, tag=f"_p{p + 1}", hw0=hw0,
                        flip_order=(p % 2 == 1))
        s["gate_probes"] = probes
        s["pair"] = p + 1
        s["leg_order"] = f"local[{n2}] first" if p % 2 == 1 \
            else f"local[{n1}] first"
        out.append(s)
        # persist incrementally: a late failure keeps the finished pairs
        with open(f"BENCH/scaling_multi_{n1}v{n2}_partial.json", "w") as f:
            json.dump(out, f)
    if not out:
        raise RuntimeError("no pair completed: every calibration gate "
                           "failed — machine contended all session")
    effs = sorted(s["efficiency"] for s in out)
    med = statistics.median(effs)
    pin = bool(os.environ.get("SPARK_GRAFT_PIN"))
    files = out[0]["rn"]["files"]
    rows = "\n".join(
        f"| {s['pair']} | {s['leg_order']} | {s['gate_probes']} "
        f"| {s['hw']['randmem_ceiling']} | {s['rn']['sec']} "
        f"| {s['r4n']['sec']} | {s['rn']['files_per_sec']} "
        f"| {s['r4n']['files_per_sec']} | **{s['efficiency']}** |"
        for s in out)
    with open(f"BENCH/scaling_multi_{n1}v{n2}_{files}.md", "w") as f:
        f.write(f"""# Multi-pair scaling — local[{n1}] vs local[{n2}], {files} files, {len(out)} calibration-gated pairs{' (PINNED)' if pin else ''}

**Headline scaling efficiency (median of {len(out)} gated same-run pairs) =
{med:.3f}** (target >= 0.8).  Spread: {effs[0]:.3f} - {effs[-1]:.3f}.

Protocol (VERDICT r05 #2): each pair launches only after two consecutive
random-gather calibration probes land in [0.48, 1.05]; both legs run
back-to-back in the same window ({reps} reps each, best-of); leg order
alternates across pairs so slow co-tenant drift cannot systematically
throttle one leg.

| pair | leg order | gate probes | randmem ceiling | local[{n1}] wall | local[{n2}] wall | rate N | rate 4N | efficiency |
|---|---|---|---|---|---|---|---|---|
{rows}

Per-pair reports: `scaling_{n1}v{n2}_{files}_p*.md`; legs:
`leg_local*_c{copies}_p*.json`.
{f'''
{gate_failed} of {pairs} attempted pairs never launched: their calibration
gate saw no two consecutive in-band probes in 20 attempts (machine
contended) and skipped the window rather than measure a neighbor.''' if gate_failed else ''}
""")
    print(json.dumps({"median_efficiency": round(med, 3),
                      "efficiencies": effs, "pairs": len(out),
                      "gate_failed_pairs": gate_failed,
                      "levels": levels, "pinned": pin, "files": files}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--kg-only":
        reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        print(json.dumps(run_kg_only(int(sys.argv[2]), int(sys.argv[3]), reps)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
        levels = ((int(sys.argv[3]), int(sys.argv[4]))
                  if len(sys.argv) > 4 else (2, 8))
        run_scaling(copies, levels)
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling-multi":
        copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
        levels = ((int(sys.argv[3]), int(sys.argv[4]))
                  if len(sys.argv) > 4 else (2, 8))
        pairs = int(sys.argv[5]) if len(sys.argv) > 5 else 3
        reps = int(sys.argv[6]) if len(sys.argv) > 6 else 2
        run_scaling_multi(copies, levels, pairs, reps)
    else:
        print(json.dumps(run_default()))
