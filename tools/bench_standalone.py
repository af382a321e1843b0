"""REAL multi-executor scaling evidence: N vs 4N separate executor JVMs
on a Spark standalone cluster.

The north rule asks for "spark-submit on a multi-executor cluster at two
cluster sizes (N and 4N executors)". `tools/bench_scaling.py` evidences
this with local-mode thread counts; this harness runs the SAME cascade
job on an actual standalone cluster on this host — one master + 8
single-core worker daemons, each executor a separate JVM with its own
heap, Netty shuffle server, and (tmpfs) local dirs — and compares the
app capped at 2 executors vs 8 executors (`spark.cores.max`).  That
exercises the real cluster code paths local mode cannot: executor
registration, remote (socket, not in-process) shuffle fetch,
task-result serialization, and `--py-files` shipping of the engine zip
(`spark.submit.pyFiles`, built by tools/make_pyfiles.py).

Usage: python tools/bench_standalone.py [sf_dir]
  env: SPARK_GRAFT_SCALE_N (default 2; 4N executors = 4x that),
       SPARK_GRAFT_SCALE_REST (seconds between legs, default 0),
       SPARK_GRAFT_SCALING_URLS (default 4096 -> 162M signal points).

Writes one JSON line and inserts/refreshes the "## Real multi-executor
evidence" section of BENCH/BASELINE.md (which bench_scaling.py
preserves).  Run under the probe gate (MODE=standalone
tools/bench_when_rested.sh) — the host-throttle protocol applies to
cluster runs exactly as to local ones.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
RUN_DIR = "/tmp/spark_standalone"
MASTER_URL = "spark://127.0.0.1:7077"
N_WORKERS = 8
SECTION = "## Real multi-executor evidence (standalone cluster)"


def _spark_class(args: list[str], log: str) -> subprocess.Popen:
    env = dict(os.environ, SPARK_LOCAL_DIRS="/dev/shm/spark-local")
    with open(log, "w") as lf:
        return subprocess.Popen(
            [os.path.join(SPARK_HOME, "bin", "spark-class"), *args],
            stdout=lf,
            stderr=subprocess.STDOUT,
            env=env,
            start_new_session=True,
        )


def start_cluster(worker_mem: str = "11g") -> list[subprocess.Popen]:
    os.makedirs(RUN_DIR, exist_ok=True)
    procs = [
        _spark_class(
            [
                "org.apache.spark.deploy.master.Master",
                "-h", "127.0.0.1", "-p", "7077", "--webui-port", "0",
            ],
            f"{RUN_DIR}/master.log",
        )
    ]
    time.sleep(5)
    for i in range(N_WORKERS):
        procs.append(
            _spark_class(
                [
                    "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                    "-c", "1", "-m", worker_mem,
                    "-h", "127.0.0.1", "--webui-port", "0",
                ],
                f"{RUN_DIR}/worker{i}.log",
            )
        )
    # wait for every worker to register
    deadline = time.time() + 60
    while time.time() < deadline:
        n = sum(
            1
            for i in range(N_WORKERS)
            if os.path.exists(f"{RUN_DIR}/worker{i}.log")
            and "Successfully registered with master"
            in open(f"{RUN_DIR}/worker{i}.log").read()
        )
        if n == N_WORKERS:
            return procs
        time.sleep(2)
    raise RuntimeError("workers failed to register; see /tmp/spark_standalone")


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        try:
            os.killpg(p.pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
    time.sleep(3)
    for p in procs:
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass


def run_leg(cores: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=MASTER_URL,
        SPARK_GRAFT_PYFILES=os.path.join(
            REPO, "usgs_geomag_algorithms_spark.zip"
        ),
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_URLS=os.environ.get(
            "SPARK_GRAFT_SCALING_URLS", "4096"
        ),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cascade-only"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"leg at {cores} produced no JSON:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def update_baseline_md(result: dict, n_lo: int, n_hi: int) -> None:
    lo, hi = result[f"executors{n_lo}"], result[f"executors{n_hi}"]
    section = f"""{SECTION}

Same cascade job, same {result['input_points']:,}-point input, on a REAL
standalone cluster on this host: 1 master + {N_WORKERS} single-core worker
daemons, each executor a separate JVM (own heap, Netty shuffle server,
tmpfs local dirs), engine shipped to executors as a --py-files zip
(spark.submit.pyFiles). The app is capped at N vs 4N executors via
spark.cores.max — genuine {n_lo}-executor vs {n_hi}-executor runs, not
thread counts.

| run | executors | wall (s) | points/sec | efficiency vs 4x executors |
|---|---|---|---|---|
| cascade sec->min->hour->day | {n_lo} x 1-core JVM | {lo['wall_sec']} | {lo['points_per_sec']:,} | baseline |
| cascade sec->min->hour->day | {n_hi} x 1-core JVM | {hi['wall_sec']} | {hi['points_per_sec']:,} | **{result['scaling_efficiency']}** (target >= 0.8) |

Generated by `python tools/bench_standalone.py` (probe-gated via
`MODE=standalone tools/bench_when_rested.sh`).
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    prev = open(path).read() if os.path.exists(path) else ""
    if SECTION in prev:
        head, rest = prev.split(SECTION, 1)
        # drop the old section body (up to the next "## " heading)
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1 :] if nxt != -1 else ""
        new = head + section + "\n" + tail
    elif "## Notes" in prev:
        head, tail = prev.split("## Notes", 1)
        new = head + section + "\n## Notes" + tail
    else:
        new = prev + "\n" + section
    with open(path, "w") as f:
        f.write(new)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    n_hi = 4 * n_lo
    if n_hi > N_WORKERS:
        raise SystemExit(f"need {n_hi} single-core workers, have {N_WORKERS}")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        check=True,
        capture_output=True,
    )
    procs = start_cluster()
    try:
        r_hi = run_leg(n_hi, sf_dir)
        rest = int(os.environ.get("SPARK_GRAFT_SCALE_REST", "0"))
        if rest:
            time.sleep(rest)
        r_lo = run_leg(n_lo, sf_dir)
    finally:
        stop_cluster(procs)
    t_lo = r_lo["warm"]["wall_sec"]
    t_hi = r_hi["warm"]["wall_sec"]
    eff = (t_lo / t_hi) / (n_hi / n_lo)
    result = {
        "input_points": r_hi["warm"]["input_points"],
        f"executors{n_lo}": {
            "wall_sec": t_lo,
            "points_per_sec": r_lo["warm"]["points_per_sec"],
        },
        f"executors{n_hi}": {
            "wall_sec": t_hi,
            "points_per_sec": r_hi["warm"]["points_per_sec"],
        },
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result, indent=2))
    update_baseline_md(result, n_lo, n_hi)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
