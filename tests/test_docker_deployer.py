"""DockerTaskDeployer contract tests.

The argv contract is tested daemon-free (the CLI IS the Docker API
here); the live round-trip needs a prepared worker image and a Docker
daemon, neither of which exists in the sandbox — it skips cleanly,
like the Kafka integration tests (`docs/DEPLOY.md` documents the
image recipe)."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from old_original_java_little_horse_spark.engine.docker_deployer import (
    DockerTaskDeployer,
)


def _deployer(tmp_path) -> DockerTaskDeployer:
    return DockerTaskDeployer(
        base_dir=str(tmp_path), spec_name="greeter",
        image="lh-spark-worker:latest",
        executors={"greet": "my_tasks:greet", "double": "my_tasks:double"},
        env={"LH_SPARK_SERVING_BUCKETS": "64"},
    )


def test_run_argv_contract(tmp_path):
    """One container per TaskDef, named/labelled like the reference
    (`DockerTaskDeployer.java:54-72`), the state root volume-mounted,
    the executor binding passed through, the entrypoint the standalone
    worker verb."""
    dep = _deployer(tmp_path)
    argv = dep.run_argv("greet")

    assert argv[:3] == ["docker", "run", "-d"]
    assert dep.container_name("greet") == "lh-task-greet"
    assert "lh-task-greet" in argv
    assert "io.littlehorse/deployedBy=true" in argv
    assert "io.littlehorse/taskDefId=greet" in argv
    assert f"{tmp_path}:/data" in " ".join(argv)
    assert "LH_SPARK_SERVING_BUCKETS=64" in argv

    tail = argv[argv.index("lh-spark-worker:latest") + 1:]
    assert tail == ["python", "-m",
                    "old_original_java_little_horse_spark.cli", "work",
                    "--base-dir", "/data", "--spec", "greeter",
                    "--task-def", "greet", "--executor", "my_tasks:greet"]

    # per-TaskDef isolation: distinct names + executor bindings
    argv2 = dep.run_argv("double")
    assert "lh-task-double" in argv2 and "my_tasks:double" in argv2


def test_deploy_launches_one_container_per_taskdef(tmp_path, monkeypatch):
    """`deploy` runs one `docker run` per TaskDef; `shutdown` kills
    (errors swallowed, reference parity) then removes each."""
    calls: list[list[str]] = []

    def fake_run(argv, **kw):
        calls.append(list(argv))
        if argv[1] == "kill":
            return subprocess.CompletedProcess(argv, 1, b"", b"no such")
        return subprocess.CompletedProcess(argv, 0, b"cid", b"")

    monkeypatch.setattr(subprocess, "run", fake_run)
    dep = _deployer(tmp_path)
    with dep:
        pass
    runs = [c for c in calls if c[1] == "run"]
    kills = [c for c in calls if c[1] == "kill"]
    rms = [c for c in calls if c[1] == "rm"]
    assert len(runs) == 2 and len(kills) == 2 and len(rms) == 2
    assert {c[c.index("--name") + 1] for c in runs} == \
        {"lh-task-greet", "lh-task-double"}


def test_live_docker_round_trip(tmp_path):
    """Full container round-trip; needs a daemon + prepared image."""
    image = os.environ.get("LH_SPARK_WORKER_IMAGE")
    if not image or shutil.which("docker") is None:
        pytest.skip("no Docker daemon / LH_SPARK_WORKER_IMAGE unset")
    dep = DockerTaskDeployer(
        base_dir=str(tmp_path), spec_name="greeter", image=image,
        executors={"greet": "my_tasks:greet"})
    with dep:
        out = subprocess.run(
            ["docker", "ps", "--filter",
             "label=io.littlehorse/taskDefId=greet",
             "--format", "{{.Names}}"],
            capture_output=True, check=True).stdout.decode()
        assert "lh-task-greet" in out
