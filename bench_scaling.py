#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8 from
N to 4N executors).

No real cluster exists in this sandbox, so per driver instruction we
evidence the criterion by running the SAME index-build job on the SAME
input at two parallelism levels — ``local[N]`` and ``local[4N]``
(default N=8) — and reporting throughput at both plus

    efficiency = (thr_4N / thr_N) / 4

Each level runs in its own subprocess (Spark master is fixed per JVM).
Results are printed as one JSON line and appended to BASELINE.md by
``--update-baseline``.

Usage:
    python bench_scaling.py                  # run both levels, print JSON
    python bench_scaling.py --update-baseline  # ... and rewrite the
                                               # "Measured scaling" section
    python bench_scaling.py --worker CPUS    # internal: one level
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "40000"))
N_SMALL = int(os.environ.get("SPARK_GRAFT_SCALING_N", "8"))


def _steal_ticks() -> int | None:
    """Cumulative hypervisor steal ticks (USER_HZ), as in bench.py:
    loadavg only sees this VM's runnable tasks; co-tenant theft shows up
    here instead. None (not 0) when /proc/stat is unreadable or has no
    steal field — "unmeasurable" must stay distinguishable from
    "measured zero theft", since the recorded steal_s adjudicates
    failing scaling ratios (r5 review)."""
    try:
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu "):
                    parts = line.split()
                    return int(parts[8]) if len(parts) > 8 else None
    except OSError:
        pass
    return None


def _corpus_path() -> str:
    return os.path.join(tempfile.gettempdir(), f"scaling_corpus_{N_DOCS}")


def _scratch_dir() -> str:
    """Scratch for the measured job's writes (index output + Spark local
    dirs). tmpfs when available: the sandbox VM shares its virtio disk
    with other guests, and writeback contention there showed 40%
    run-to-run wall variance on an identical CPU-bound job (measured r2:
    83 s vs 116 s back-to-back). A real cluster's executors write to
    provisioned local SSDs; tmpfs is the honest stand-in, and the RAM
    footprint (index + shuffle, ~3 GB at 2M docs) is far below the VM's
    126 GB."""
    base = os.environ.get("SPARK_GRAFT_SCALING_WORKDIR") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    )
    return os.path.join(base, "scaling_scratch")


def gen_corpus() -> None:
    """Pre-generate the shared corpus parquet (unpinned, full machine)."""
    from dbsyncer_spark.fixtures.corpus import corpus_df_distributed
    from dbsyncer_spark.session import get_spark

    path = _corpus_path()
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    spark = get_spark("scaling_gen", cpus=os.cpu_count() or 8)
    corpus_df_distributed(spark, N_DOCS, seed=42, partitions=64).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def worker(cpus: int) -> None:
    from dbsyncer_spark.index.build import build_index
    from dbsyncer_spark.session import get_spark

    # shuffle partitions track core count, exactly as on a real cluster.
    # maxPartitionBytes is sized so the input splits >= cores even for the
    # small bench corpus (at 100 TB the default 128 MB already yields
    # ~1e6 splits; a handful of small bench files would otherwise coalesce
    # into 2-3 splits and serialize the first stage).
    scratch = _scratch_dir()
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(
        f"scaling_{cpus}",
        cpus=cpus,
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.local.dir": os.path.join(scratch, f"spark_local_{cpus}"),
        },
    )
    docs = spark.read.parquet(_corpus_path())
    idx_dir = os.path.join(scratch, f"scaling_idx_{cpus}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    # worker prewarm = executor provisioning, off the clock (both levels)
    from dbsyncer_spark.session import warm_python_workers

    warm_python_workers(spark)
    t0 = time.perf_counter()
    build_index(spark, docs, idx_dir, num_shards=32, resume=False)
    dt = time.perf_counter() - t0
    shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "build_s": round(dt, 3),
                      "docs_per_sec": round(N_DOCS / dt, 1)}))


def run_level(cpus: int) -> dict:
    """Run one parallelism level pinned to exactly ``cpus`` physical cores.

    The pinning is what makes local[N] an honest stand-in for an
    N-executor cluster: without it, local[N]'s JVM task threads AND their
    attached Python UDF workers (2N busy threads) all spill onto the full
    machine, so the small level borrows the big level's cores and the
    measured "scaling" is meaningless. A real N-core cluster slice cannot
    borrow; ``taskset -c 0..N-1`` imposes the same budget here.
    """
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    if "--gen" in sys.argv:
        gen_corpus()
        return
    # corpus synthesis off the clock (own process, unpinned)
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--gen"],
        check=True, capture_output=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    # best-of-N per level: single-shot local wall times vary ~20-40%
    # (shared-host noise, page cache, JIT); min is the steady-state
    # estimator. Writes go to tmpfs (_scratch_dir) to keep the shared
    # virtio disk out of the measurement entirely. Reps INTERLEAVE the
    # two levels (N, 4N, N, 4N, ...) so both sample the same co-tenant
    # windows — running all N reps then all 4N reps lets a noise window
    # tax one level only and swing the efficiency ratio either way.
    # Per-rep 1-min loadavg AND hypervisor steal seconds are recorded
    # for disclosure: co-tenant CPU theft on this VM arrives in bursts
    # that loadavg cannot see (a rep can lose whole core-minutes at
    # loadavg < 1), and a stolen burst taxes the wide level ~4x harder
    # than the narrow one (more threads stalled per stolen tick), so
    # steal is the number that adjudicates whether a failing ratio
    # measured the engine or the hypervisor.
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    runs = {N_SMALL: [], 4 * N_SMALL: []}
    loads = []
    steals = []
    for _ in range(reps):
        for cpus in (N_SMALL, 4 * N_SMALL):
            with open("/proc/loadavg") as f:
                loads.append(float(f.read().split()[0]))
            s0 = _steal_ticks()
            r = run_level(cpus)
            s1 = _steal_ticks()
            r["steal_s"] = (round((s1 - s0) / 100.0, 1)
                            if s0 is not None and s1 is not None else None)
            steals.append(r["steal_s"])
            runs[cpus].append(r)
    small = min(runs[N_SMALL], key=lambda r: r["build_s"])
    big = min(runs[4 * N_SMALL], key=lambda r: r["build_s"])
    eff = (big["docs_per_sec"] / small["docs_per_sec"]) / 4.0
    result = {
        "n_docs": N_DOCS,
        "small": small,
        "big": big,
        "scaling_efficiency": round(eff, 3),
        "criterion": ">=0.8",
        "pass": eff >= 0.8,
        "loadavg_per_rep": loads,
        "steal_s_per_rep": steals,
    }
    print(json.dumps(result))
    if "--update-baseline" in sys.argv:
        update_baseline(result)


def update_baseline(result: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    section = f"""<!-- scaling:begin -->
## Measured scaling (this engine, sandbox evidence for the north rule)

Same index-build job (code-aware tokenize -> tf agg -> salted repartition
-> pack delta+VByte postings -> dictionary), same {result['n_docs']}-doc
deterministic corpus, two parallelism levels (no real cluster in the
sandbox; `local[N]` stands in for N executors, and each level is pinned
to exactly its core budget with `taskset -c 0..N-1` so the small level
cannot borrow the big level's cores through its Python UDF workers).
Each level is best-of-{os.environ.get("SPARK_GRAFT_SCALING_REPS", "3")},
reps interleave the two levels so both sample the same co-tenant noise
windows (1-min loadavg at rep starts: {result.get('loadavg_per_rep')};
hypervisor steal seconds inside each rep: {result.get('steal_s_per_rep')}
— steal is the co-tenant theft loadavg cannot see, and a burst taxes the
wide level harder), and
writes (index output + Spark local dirs) go to tmpfs: the VM's shared
virtio disk adds up to 40% run-to-run wall noise that a real cluster's
executor-local SSDs would not (a cold run is NOT the steady state being
claimed):

| parallelism | build time (s) | throughput (docs/s) |
|---|---|---|
| local[{result['small']['cpus']}] (N) | {result['small']['build_s']} | {result['small']['docs_per_sec']} |
| local[{result['big']['cpus']}] (4N) | {result['big']['build_s']} | {result['big']['docs_per_sec']} |

Scaling efficiency (thr_4N / thr_N) / 4 = **{result['scaling_efficiency']}**
(criterion >= 0.8: {"PASS" if result['pass'] else "FAIL"}).
Reproduce (same configuration as this table):
`SPARK_GRAFT_SCALING_DOCS={result['n_docs']} SPARK_GRAFT_SCALING_N={result['small']['cpus']} python bench_scaling.py --update-baseline`.
<!-- scaling:end -->"""
    with open(path) as f:
        text = f.read()
    if "<!-- scaling:begin -->" in text:
        text = re.sub(r"<!-- scaling:begin -->.*?<!-- scaling:end -->", section,
                      text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
