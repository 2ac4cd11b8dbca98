"""Local standalone Spark cluster: N separate worker/executor JVMs.

The north rule's scaling criterion is "N and 4N EXECUTORS".  local[k]
approximates that with task threads inside ONE JVM, which saturates on
shared GC/allocator/shuffle structures well before 4N threads — a
limitation of the emulation, not of the engine under test.  This module
starts a real standalone cluster on the box instead: one Master plus N
Workers, each Worker pinned (taskset) to its own disjoint core range and
spawning its own executor JVM with its own heap — exactly the resource
geometry of adding executors to a real cluster (per-executor cores and
memory constant, count scales).

Used by scripts/bench_scaling.py with SPARK_GRAFT_SCALE_MODE=cluster:
level N = 1 worker x 4 cores, level 4N = 4 workers x 4 cores.  The
driver (and Master) are pinned to cores OUTSIDE the measured budget and
are identical at both levels — the scaled quantity is executors only,
as the rule states.
"""

from __future__ import annotations

import os
import socket
import subprocess
import time

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_HOST = "127.0.0.1"
MASTER_PORT = 7077
MASTER_URL = f"spark://{MASTER_HOST}:{MASTER_PORT}"


def _spark_class(
    *args: str,
    taskset: str | None = None,
    logfile: str | None = None,
    env: dict[str, str] | None = None,
):
    cmd: list[str] = []
    if taskset:
        cmd += ["taskset", "-c", taskset]
    cmd += [os.path.join(SPARK_HOME, "bin", "spark-class"), *args]
    out = open(logfile, "ab") if logfile else subprocess.DEVNULL
    return subprocess.Popen(
        cmd, stdout=out, stderr=subprocess.STDOUT, env={**os.environ, **(env or {})}
    )


def _wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        try:
            with socket.create_connection((MASTER_HOST, port), timeout=1):
                return
        except OSError:
            time.sleep(0.3)
    raise RuntimeError(f"port {port} not up after {timeout}s")


def start_cluster(
    n_workers: int,
    cores_per_worker: int = 4,
    worker_mem: str = "10g",
    base_cpu: int = 0,
    driver_cpus: str = "16-17",
    work_dir_root: str = "/dev/shm/graft_workers",
) -> list[subprocess.Popen]:
    """Start master + n pinned workers; returns processes (newest last)."""
    procs = [
        _spark_class(
            "org.apache.spark.deploy.master.Master",
            "--host", MASTER_HOST, "--port", str(MASTER_PORT), "--webui-port", "0",
            taskset=driver_cpus,
            logfile="/tmp/graft_spark_master.log",
        )
    ]
    _wait_port(MASTER_PORT)
    for i in range(n_workers):
        lo = base_cpu + i * cores_per_worker
        rng = f"{lo}-{lo + cores_per_worker - 1}"
        wd = os.path.join(work_dir_root, f"w{i}")
        scratch = os.path.join(work_dir_root, f"w{i}_scratch")
        os.makedirs(wd, exist_ok=True)
        os.makedirs(scratch, exist_ok=True)
        procs.append(
            _spark_class(
                "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                "--cores", str(cores_per_worker), "--memory", worker_mem,
                "--webui-port", "0", "--work-dir", wd,
                taskset=rng,
                logfile=f"/tmp/graft_spark_worker_{i}.log",
                # executors inherit shuffle-scratch dirs from the WORKER's
                # SPARK_LOCAL_DIRS (spark.local.dir is overridden by the
                # cluster manager) — per-worker tmpfs dir, mirroring
                # per-executor local SSDs on a real cluster
                env={"SPARK_LOCAL_DIRS": scratch},
            )
        )
    # workers register asynchronously; the driver additionally gates on
    # minRegisteredResourcesRatio=1.0 (set by session.get_spark in
    # cluster mode), so a short grace period here is enough
    time.sleep(4)
    return procs


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        p.terminate()
    for p in reversed(procs):
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()
