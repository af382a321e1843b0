"""The north-rule deployment shape end-to-end: spark-submit --py-files
against a REAL standalone cluster (separate master/worker/executor JVMs),
not local-mode threads.

Starts a throwaway cluster on a non-default port (1 master + 2
single-core workers), submits jobs/run_cascade.py from OUTSIDE the repo
with the engine shipped only via the --py-files zip, and reads the built
store back in-process.  This is the pytest twin of
tools/bench_standalone.py (which measures N-vs-4N executor scaling on
the same shape).
"""

import json
import os
import shutil
import signal
import subprocess
import sys
import time

import pyspark

MASTER_PORT = 7079
MASTER_URL = f"spark://127.0.0.1:{MASTER_PORT}"


def _spark_class(args, log):
    env = dict(os.environ, SPARK_LOCAL_DIRS="/dev/shm/spark-local")
    with open(log, "w") as lf:
        return subprocess.Popen(
            [
                os.path.join(
                    os.environ.get("SPARK_HOME", "/opt/spark"),
                    "bin",
                    "spark-class",
                ),
                *args,
            ],
            stdout=lf,
            stderr=subprocess.STDOUT,
            env=env,
            start_new_session=True,
        )


def _start_cluster(tmp_path, n_workers=2):
    procs = [
        _spark_class(
            [
                "org.apache.spark.deploy.master.Master",
                "-h", "127.0.0.1", "-p", str(MASTER_PORT),
                "--webui-port", "0",
            ],
            str(tmp_path / "master.log"),
        )
    ]
    time.sleep(4)
    logs = []
    for i in range(n_workers):
        log = str(tmp_path / f"worker{i}.log")
        logs.append(log)
        procs.append(
            _spark_class(
                [
                    "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                    "-c", "1", "-m", "3g",
                    "-h", "127.0.0.1", "--webui-port", "0",
                ],
                log,
            )
        )
    deadline = time.time() + 60
    while time.time() < deadline:
        ok = sum(
            1
            for log in logs
            if os.path.exists(log)
            and "Successfully registered with master" in open(log).read()
        )
        if ok == n_workers:
            return procs
        time.sleep(2)
    _stop_cluster(procs)
    raise RuntimeError("standalone test cluster failed to start")


def _stop_cluster(procs):
    for p in reversed(procs):
        try:
            os.killpg(p.pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
    time.sleep(2)
    for p in procs:
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass


class TestExecutorLossRecovery:
    def test_job_survives_killed_worker(self, spark, tmp_path):
        """Fault tolerance only a real cluster can demonstrate: SIGKILL a
        worker (and its executor JVM) while the job is running; Spark
        reschedules the lost tasks / recomputes lost shuffle output on
        the surviving executors and the job completes with correct
        results."""
        from tools.make_pyfiles import build
        from usgs_geomag_algorithms_spark.sources.pages import generate_pages
        from usgs_geomag_algorithms_spark.sources.store import TierStore

        pages = str(tmp_path / "pages")
        generate_pages(spark, n_urls=6, hours=3.0, n_hot=3).write.parquet(
            pages
        )
        zip_path = str(tmp_path / "pkg.zip")
        build(zip_path)
        job = str(tmp_path / "run_cascade.py")
        shutil.copy(
            os.path.join(
                os.path.dirname(os.path.dirname(__file__)),
                "jobs",
                "run_cascade.py",
            ),
            job,
        )
        submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["PYSPARK_PYTHON"] = sys.executable
        # INFO so the task-start marker is visible in the driver log
        env["SPARK_GRAFT_LOG_LEVEL"] = "INFO"

        procs = _start_cluster(tmp_path, n_workers=3)
        try:
            err_path = str(tmp_path / "driver.err")
            out_path = str(tmp_path / "driver.out")
            with open(out_path, "w") as of, open(err_path, "w") as ef:
                p = subprocess.Popen(
                    [
                        submit,
                        "--master", MASTER_URL,
                        "--total-executor-cores", "3",
                        "--executor-cores", "1",
                        "--executor-memory", "2g",
                        "--py-files", zip_path,
                        job,
                        "--pages", pages,
                        "--store", str(tmp_path / "t"),
                        "--start", "2020-01-06T00:00:00",
                        "--end", "2020-01-06T02:59:59",
                        "--channels", "text_len",
                    ],
                    stdout=of,
                    stderr=ef,
                    cwd=str(tmp_path),
                    env=env,
                )
                # wait for the first tasks to actually run, then kill a
                # worker process group (worker daemon + its executor)
                deadline = time.time() + 120
                started = False
                while time.time() < deadline:
                    if "Starting task" in open(err_path).read():
                        started = True
                        break
                    time.sleep(0.5)
                assert started, "job never started tasks"
                os.killpg(procs[-1].pid, signal.SIGKILL)
                rc = p.wait(timeout=280)
            err = open(err_path).read()
            assert rc == 0, err[-2000:]
            # the loss actually happened mid-job and was recovered
            assert (
                "Lost executor" in err
                or "ExecutorLostFailure" in err
                or "worker lost" in err.lower()
            ), err[-2000:]
        finally:
            _stop_cluster(procs)

        line = [
            l for l in open(out_path).read().splitlines()
            if l.startswith("{")
        ][-1]
        metrics = json.loads(line)
        assert metrics["tiers"]["minute"] > 0
        # results are correct despite the loss: equal to an in-process run
        from usgs_geomag_algorithms_spark.operators.cascade import run_tiers
        from usgs_geomag_algorithms_spark.sources.signals import page_signals
        from usgs_geomag_algorithms_spark.tiers import US

        t0 = 1578268800
        sig = page_signals(
            spark.read.parquet(pages), channels=("text_len",)
        )
        # same scan range the CLI passes to build_tiers (no extra pad)
        want = run_tiers(
            sig, 1.0, t0 * US, (t0 + 3 * 3600 - 1) * US
        )["minute"].count()
        store = TierStore(spark, str(tmp_path / "t"))
        assert store.read("minute").count() == metrics["tiers"]["minute"]
        assert metrics["tiers"]["minute"] == want


class TestStandaloneClusterSubmit:
    def test_cascade_job_on_real_executors(self, spark, tmp_path):
        from tools.make_pyfiles import build
        from usgs_geomag_algorithms_spark.sources.pages import generate_pages
        from usgs_geomag_algorithms_spark.sources.store import TierStore

        pages = str(tmp_path / "pages")
        generate_pages(spark, n_urls=3, hours=2.0, n_hot=3).write.parquet(
            pages
        )
        zip_path = str(tmp_path / "pkg.zip")
        build(zip_path)
        job = str(tmp_path / "run_cascade.py")
        shutil.copy(
            os.path.join(
                os.path.dirname(os.path.dirname(__file__)),
                "jobs",
                "run_cascade.py",
            ),
            job,
        )
        submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["PYSPARK_PYTHON"] = sys.executable

        procs = _start_cluster(tmp_path)
        try:
            out = subprocess.run(
                [
                    submit,
                    "--master", MASTER_URL,
                    "--total-executor-cores", "2",
                    "--executor-cores", "1",
                    "--executor-memory", "2g",
                    "--py-files", zip_path,
                    job,
                    "--pages", pages,
                    "--store", str(tmp_path / "t"),
                    "--start", "2020-01-06T00:00:00",
                    "--end", "2020-01-06T01:59:59",
                    "--channels", "text_len",
                ],
                capture_output=True,
                text=True,
                timeout=280,
                cwd=str(tmp_path),
                env=env,
            )
        finally:
            _stop_cluster(procs)
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        metrics = json.loads(line)
        assert metrics["tiers"]["minute"] > 0
        # two separate 1-core executor JVMs actually ran the job (each
        # worker daemon logs the launch of its one executor)
        launched = sum(
            open(tmp_path / f"worker{i}.log").read().count(
                "Asked to launch executor"
            )
            for i in range(2)
        )
        assert launched == 2
        store = TierStore(spark, str(tmp_path / "t"))
        assert store.read("minute").count() == metrics["tiers"]["minute"]
