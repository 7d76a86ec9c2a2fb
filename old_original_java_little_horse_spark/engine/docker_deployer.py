"""Docker deployer: one worker CONTAINER per TaskDef.

Parity surface for the reference's `DockerTaskDeployer.java:40-88`:
`deploy` creates + starts one container per TaskDef (named
``lh-task-<taskDefId>``, labelled ``io.littlehorse/deployedBy`` /
``io.littlehorse/taskDefId``, handed its executor binding through the
environment); `undeploy` kills (errors swallowed, as the reference
does) and removes it.

The container entrypoint is the standalone worker verb
(`cli.py cmd_work` — the same engine ⇄ worker contract as
`LocalDeployer`, transported over the engine's tagged-output /
event-topic directories on a shared volume instead of process
queues).  Swapping `LocalDeployer._spawn`'s `Process.start()` for
`docker run` is the WHOLE difference — routing, idempotent dedupe,
and the O(new-rows) worker checkpoint are untouched, which is the
point of the contract.

Nothing here needs a Docker SDK: the CLI is the API (argv built by
`run_argv`, unit-testable without a daemon; the live test is gated on
a prepared image since the sandbox ships no Docker daemon —
`docs/DEPLOY.md` has the compose recipe).
"""

from __future__ import annotations

import subprocess
from pathlib import Path

_LABEL_DEPLOYED = "io.littlehorse/deployedBy=true"
_LABEL_ACTIVE = "io.littlehorse/active=true"


class DockerTaskDeployer:
    """Deploys one worker container per TaskDef.

    Parameters
    ----------
    base_dir : the `serve --base-dir` state root on the HOST; mounted
        into each container at `data_mount` so workers tail the spec
        engine's tagged output and append TASK_EVENTs to its event
        topic directory.
    spec_name : WFSpec whose engine directory the workers serve.
    image : worker image (python + pyspark + this package installed).
    executors : TaskDef name -> "module.path:function" executor binding
        (the reference's TASK_EXECUTOR_CLASS_KEY env).
    """

    def __init__(self, base_dir: str, spec_name: str, image: str,
                 executors: dict[str, str], docker: str = "docker",
                 data_mount: str = "/data",
                 env: dict[str, str] | None = None):
        self.base_dir = str(Path(base_dir).resolve())
        self.spec_name = spec_name
        self.image = image
        self.executors = dict(executors)
        self.docker = docker
        self.data_mount = data_mount
        self.env = dict(env or {})

    # -- argv construction (the unit-testable contract) -----------------

    def container_name(self, task_def: str) -> str:
        # "lh-task-" + objectId, DockerTaskDeployer.java:69
        return f"lh-task-{task_def}"

    def run_argv(self, task_def: str) -> list[str]:
        argv = [self.docker, "run", "-d",
                "--name", self.container_name(task_def),
                "--label", _LABEL_DEPLOYED,
                "--label", _LABEL_ACTIVE,
                "--label", f"io.littlehorse/taskDefId={task_def}",
                "-v", f"{self.base_dir}:{self.data_mount}"]
        for k, v in sorted(self.env.items()):
            argv += ["-e", f"{k}={v}"]
        argv += [self.image,
                 "python", "-m", "old_original_java_little_horse_spark.cli",
                 "work",
                 "--base-dir", self.data_mount,
                 "--spec", self.spec_name,
                 "--task-def", task_def,
                 "--executor", self.executors[task_def]]
        return argv

    # -- lifecycle -------------------------------------------------------

    def deploy(self) -> None:
        """Launch one container per TaskDef; on a partial failure the
        already-started containers are torn down before the error
        propagates (no unmanaged leftovers).  The FAILING TaskDef is
        rolled back too: `docker run -d` can create the named
        container and then fail to start it, and leaving that husk
        behind would make every retry fail with 'container name
        already in use'."""
        started: list[str] = []
        failing: str | None = None
        try:
            for task_def in self.executors:
                failing = task_def
                subprocess.run(self.run_argv(task_def), check=True,
                               capture_output=True)
                started.append(task_def)
        except subprocess.CalledProcessError:
            for task_def in started + ([failing] if failing else []):
                try:
                    self.undeploy(task_def)
                except subprocess.CalledProcessError:
                    pass  # best-effort rollback; the original error wins
            raise

    def undeploy(self, task_def: str) -> None:
        name = self.container_name(task_def)
        # Kill errors are swallowed "so that we end up removing it
        # anyways" (DockerTaskDeployer.java:95-101); remove errors are
        # real.
        subprocess.run([self.docker, "kill", name], capture_output=True)
        subprocess.run([self.docker, "rm", name], check=True,
                       capture_output=True)

    def shutdown(self) -> None:
        """Undeploy every TaskDef; one failing `docker rm` must not
        strand the rest, so errors are collected and re-raised after
        the full pass."""
        errors: list[Exception] = []
        for task_def in self.executors:
            try:
                self.undeploy(task_def)
            except subprocess.CalledProcessError as e:
                errors.append(e)
        if errors:
            raise errors[0]

    def __enter__(self) -> "DockerTaskDeployer":
        self.deploy()
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
