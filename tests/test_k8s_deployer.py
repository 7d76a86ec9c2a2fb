"""K8sTaskDeployer contract tests.

The manifest + argv contract is tested cluster-free (kubectl IS the
K8s API here, fed rendered manifests on stdin); the live round-trip
needs a reachable cluster and a prepared worker image, neither of
which exists in the sandbox — it skips cleanly, like the Docker and
Kafka integration tests."""

from __future__ import annotations

import json
import shutil
import subprocess

import pytest

from old_original_java_little_horse_spark.engine.k8s_deployer import (
    K8sTaskDeployer,
    k8s_name,
)


def _deployer() -> K8sTaskDeployer:
    return K8sTaskDeployer(
        base_dir="/data", spec_name="greeter",
        image="lh-spark-worker:latest",
        executors={"greet": "my_tasks:greet", "double": "my_tasks:double"},
        pvc_name="lh-state-pvc", namespace="lh",
        env={"LH_SPARK_SERVING_BUCKETS": "64"},
    )


def test_k8s_name_matches_reference_rules():
    """LHUtil.toValidK8sName fidelity: slug rules, and 63+-char names
    get the first-54 + '-' + digest8 form — never a bare truncation
    that could end in '-' (invalid DNS-1123) or collide."""
    import hashlib
    import re

    assert k8s_name("lh-task-My_Task.Name") == "lh-task-my-task-name"
    long = k8s_name("a" * 99)
    # digest suffix = LHUtil.digestify (LHUtil.java:69-77): sha256[:8]
    assert long == "a" * 54 + "-" + hashlib.sha256(
        ("a" * 99).encode()).hexdigest()[:8]
    assert long.endswith("-13284468")  # pinned: byte-parity with digestify
    assert len(long) == 63
    assert k8s_name("--Weird---chars!!") == "weird-chars"
    # the regression that motivated the digest form: a '-' landing at
    # the truncation point must not survive as a trailing dash
    tricky = k8s_name("x" * 53 + "_" + "tail" * 3)
    assert re.fullmatch(r"[a-z0-9]([-a-z0-9]*[a-z0-9])?", tricky), tricky


def test_manifest_contract():
    """One Deployment per TaskDef shaped like the reference
    (`K8sTaskDeployer.java:51-131`): reference labels on Deployment
    AND pod template, matchLabels selector over the same set,
    replicas=1, worker-verb command, executor binding in env, state
    PVC mounted at the base dir."""
    dep = _deployer()
    m = dep.manifest("greet")

    assert (m["apiVersion"], m["kind"]) == ("apps/v1", "Deployment")
    assert m["metadata"]["name"] == "lh-task-greet"
    assert m["metadata"]["namespace"] == "lh"
    want_labels = {"app": "lh-task-greet",
                   "io.littlehorse/deployedBy": "true",
                   "io.littlehorse/active": "true",
                   "io.littlehorse/taskDefId": "greet"}
    assert m["metadata"]["labels"] == want_labels
    assert m["spec"]["selector"]["matchLabels"] == want_labels
    assert m["spec"]["template"]["metadata"]["labels"] == want_labels
    assert m["spec"]["replicas"] == 1

    (c,) = m["spec"]["template"]["spec"]["containers"]
    assert c["command"] == [
        "python", "-m", "old_original_java_little_horse_spark.cli", "work",
        "--base-dir", "/data", "--spec", "greeter",
        "--task-def", "greet", "--executor", "my_tasks:greet"]
    env = {e["name"]: e["value"] for e in c["env"]}
    assert env["LH_TASK_EXECUTOR"] == "my_tasks:greet"
    assert env["LH_SPARK_SERVING_BUCKETS"] == "64"
    assert c["volumeMounts"] == [{"name": "lh-state", "mountPath": "/data"}]
    (v,) = m["spec"]["template"]["spec"]["volumes"]
    assert v["persistentVolumeClaim"]["claimName"] == "lh-state-pvc"

    # rendered form must be valid JSON (= YAML 1.2 for kubectl stdin)
    json.dumps(m)

    # per-TaskDef isolation: distinct names + executor bindings
    m2 = dep.manifest("double")
    assert m2["metadata"]["name"] == "lh-task-double"
    assert "my_tasks:double" in m2["spec"]["template"]["spec"][
        "containers"][0]["command"]


def test_delete_is_label_selector():
    """Undeploy deletes by taskDefId label, not by name
    (KDConfig.java:151-160)."""
    dep = _deployer()
    argv = dep.delete_argv("greet")
    assert "-l" in argv
    assert "io.littlehorse/taskDefId=greet" in argv
    assert "-n" in argv and "lh" in argv


def test_deploy_applies_each_and_rolls_back_on_failure(monkeypatch):
    """`deploy` pipes one manifest per TaskDef to `kubectl apply`;
    if one apply fails, the already-applied Deployments are deleted
    before the error propagates."""
    dep = _deployer()
    calls: list[tuple] = []

    def fake_run(argv, check=False, capture_output=False, input=None):
        calls.append((tuple(argv), input))
        if argv[1] == "apply" and input and b"lh-task-double" in input:
            raise subprocess.CalledProcessError(1, argv)
        return subprocess.CompletedProcess(argv, 0, b"", b"")

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(subprocess.CalledProcessError):
        dep.deploy()
    kinds = [(a[1], a[2] if len(a) > 2 else None) for a, _ in calls]
    assert kinds[0][0] == "apply"
    assert any(k == ("delete", "deployment") for k in kinds), kinds


def _kubectl_reachable() -> bool:
    if not shutil.which("kubectl"):
        return False
    try:
        return subprocess.run(
            ["kubectl", "version", "--request-timeout=2s"],
            capture_output=True, timeout=5).returncode == 0
    except Exception:
        return False


@pytest.mark.skipif(not _kubectl_reachable(),
                    reason="no reachable Kubernetes cluster")
def test_live_k8s_round_trip():
    """Apply + delete against a real cluster (needs the worker image
    pre-loaded; mirrors test_live_docker_round_trip)."""
    dep = K8sTaskDeployer(
        base_dir="/data", spec_name="greeter",
        image="lh-spark-worker:latest", executors={"greet": "my_tasks:greet"})
    with dep:
        out = subprocess.run(
            ["kubectl", "get", "deployment", "-l",
             "io.littlehorse/taskDefId=greet", "-o", "name"],
            check=True, capture_output=True)
        assert b"lh-task-greet" in out.stdout
