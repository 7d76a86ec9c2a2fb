"""Kubernetes deployer: one worker Deployment per TaskDef.

Parity surface for the reference's `K8sTaskDeployer.java:28-131` +
`KDConfig.java:98-160`: `deploy` renders an `apps/v1 Deployment`
manifest per TaskDef (name = k8s-slugged ``<prefix>-<taskDef>``,
the reference's ``io.littlehorse/deployedBy`` / ``active`` /
``taskDefId`` labels on BOTH the Deployment and the pod template,
matchLabels selector over the same set, replicas pinned to 1 — the
reference throws on >1 too, K8sTaskDeployer.java:120) and pipes it to
``kubectl apply -f -``; `undeploy` is a label-selector delete
(``kubectl delete deployment -l io.littlehorse/taskDefId=<id>``,
KDConfig.java:151-160).

The pod runs the SAME standalone worker verb as the Local and Docker
deployers (`cli.py cmd_work`) against a shared state volume (a PVC —
the file-transport twin of the reference's Kafka topics; a real
cluster swaps transport via `sources/kafka.py` and drops the volume).
Like `docker_deployer`, the CLI is the API: manifests are plain
dicts rendered to JSON (valid YAML 1.2, so no YAML dependency), argv
construction is unit-testable without a cluster, and the live path is
gated on a reachable ``kubectl``.
"""

from __future__ import annotations

import json
import re
import subprocess

_LABELS_STATIC = {
    "io.littlehorse/deployedBy": "true",
    "io.littlehorse/active": "true",
}


def k8s_name(raw: str) -> str:
    """LHUtil.toValidK8sName (LHUtil.java:53-67), full fidelity:
    lowercase, separators→'-', strip other non-alphanumerics,
    collapse dashes, trim — and names of 63+ chars become
    first-54 + '-' + 8-char digest, exactly like the reference.  The
    digest suffix (not a bare truncation) keeps long names BOTH
    DNS-1123-valid (no trailing dash can survive — the suffix ends in
    hex) and collision-resistant when two TaskDefs share a 54-char
    prefix.  (`functions.expressions.k8s_slug` is the simplified
    SQL twin capped at 54, pinned against its own oracle.)"""
    import hashlib

    s = raw.lower()
    s = re.sub(r"[. _\n]", "-", s)
    s = re.sub(r"[^0-9a-z-]", "", s)
    s = re.sub(r"-+", "-", s).strip("-")
    if len(s) >= 63:
        # LHUtil.digestify (LHUtil.java:69-77): sha256 hex, first 8 —
        # byte-for-byte the reference's suffix for long names.
        s = s[:54] + "-" + hashlib.sha256(s.encode()).hexdigest()[:8]
    return s


class K8sTaskDeployer:
    """Deploys one worker Deployment per TaskDef.

    Parameters
    ----------
    base_dir : state root INSIDE the pods (the PVC mount path); the
        engine serving `spec_name` must write its tagged output and
        event topic under the same volume.
    spec_name : WFSpec whose engine directory the workers serve.
    image : worker image (python + pyspark + this package installed).
    executors : TaskDef name -> "module.path:function" executor
        binding (the reference's TASK_EXECUTOR_CLASS_KEY env).
    pvc_name : PersistentVolumeClaim backing `base_dir`.
    namespace : target namespace (KDConfig.getDefaultK8sNamespace).
    name_prefix : k8s name prefix (KDConfig.k8sNamePrefix).
    """

    def __init__(self, base_dir: str, spec_name: str, image: str,
                 executors: dict[str, str], pvc_name: str = "lh-state",
                 namespace: str = "default", name_prefix: str = "lh-task",
                 kubectl: str = "kubectl",
                 env: dict[str, str] | None = None):
        self.base_dir = base_dir
        self.spec_name = spec_name
        self.image = image
        self.executors = dict(executors)
        self.pvc_name = pvc_name
        self.namespace = namespace
        self.name_prefix = name_prefix
        self.kubectl = kubectl
        self.env = dict(env or {})

    # -- manifest construction (the unit-testable contract) --------------

    def deployment_name(self, task_def: str) -> str:
        # getK8sName: slug(prefix + "-" + name), KDConfig.java:98-100
        return k8s_name(f"{self.name_prefix}-{task_def}")

    def _labels(self, task_def: str) -> dict[str, str]:
        return {"app": self.deployment_name(task_def),
                **_LABELS_STATIC,
                "io.littlehorse/taskDefId": task_def}

    def manifest(self, task_def: str) -> dict:
        """The apps/v1 Deployment dict (K8sTaskDeployer.java:51-131
        field-for-field, with the worker-verb command standing in for
        the reference's `java -cp ... TaskWorker` entrypoint)."""
        name = self.deployment_name(task_def)
        labels = self._labels(task_def)
        env = [{"name": k, "value": v} for k, v in sorted({
            **self.env,
            "LH_TASK_DEF_ID": task_def,
            "LH_SPEC_NAME": self.spec_name,
            "LH_TASK_EXECUTOR": self.executors[task_def],
        }.items())]
        container = {
            "name": name,
            "image": self.image,
            "imagePullPolicy": "IfNotPresent",
            "command": [
                "python", "-m", "old_original_java_little_horse_spark.cli",
                "work",
                "--base-dir", self.base_dir,
                "--spec", self.spec_name,
                "--task-def", task_def,
                "--executor", self.executors[task_def]],
            "env": env,
            "volumeMounts": [{"name": "lh-state",
                              "mountPath": self.base_dir}],
        }
        return {
            "apiVersion": "apps/v1",
            "kind": "Deployment",
            "metadata": {"name": name, "namespace": self.namespace,
                         "labels": labels},
            "spec": {
                # replicas > 1 needs per-replica work sharding the
                # file transport does not do (the reference throws
                # "Not yet supported!" there too) — the Kafka
                # transport's consumer group is the scale-out path.
                "replicas": 1,
                "selector": {"matchLabels": labels},
                "template": {
                    "metadata": {"name": name,
                                 "namespace": self.namespace,
                                 "labels": labels},
                    "spec": {
                        "containers": [container],
                        "volumes": [{
                            "name": "lh-state",
                            "persistentVolumeClaim": {
                                "claimName": self.pvc_name}}],
                    },
                },
            },
        }

    def apply_argv(self) -> list[str]:
        return [self.kubectl, "apply", "-f", "-"]

    def delete_argv(self, task_def: str) -> list[str]:
        # label-selector delete, KDConfig.java:151-160
        return [self.kubectl, "delete", "deployment",
                "-n", self.namespace,
                "-l", f"io.littlehorse/taskDefId={task_def}",
                "--ignore-not-found"]

    # -- lifecycle -------------------------------------------------------

    def deploy(self) -> None:
        """Apply one Deployment per TaskDef; a partial failure rolls
        back the already-applied ones before the error propagates
        (`kubectl apply` is idempotent, so no husk-name hazard like
        `docker run`'s, but unmanaged leftovers are still wrong)."""
        applied: list[str] = []
        try:
            for task_def in self.executors:
                subprocess.run(
                    self.apply_argv(), check=True, capture_output=True,
                    input=json.dumps(self.manifest(task_def)).encode())
                applied.append(task_def)
        except subprocess.CalledProcessError:
            for task_def in applied:
                try:
                    self.undeploy(task_def)
                except subprocess.CalledProcessError:
                    pass  # best-effort rollback; the original error wins
            raise

    def undeploy(self, task_def: str) -> None:
        subprocess.run(self.delete_argv(task_def), check=True,
                       capture_output=True)

    def shutdown(self) -> None:
        """Undeploy every TaskDef; one failing delete must not strand
        the rest, so errors are collected and re-raised after the
        full pass."""
        errors: list[Exception] = []
        for task_def in self.executors:
            try:
                self.undeploy(task_def)
            except subprocess.CalledProcessError as e:
                errors.append(e)
        if errors:
            raise errors[0]

    def __enter__(self) -> "K8sTaskDeployer":
        self.deploy()
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
