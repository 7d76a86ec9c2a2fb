"""Feature-detect `google.protobuf`, falling back to a pure-Python
runtime already present on the host.

Spark 4's `transformWithStateInPandas` Python worker speaks a
protobuf state-server protocol (`pyspark/sql/streaming/proto/
StateMessage_pb2.py`); without an importable `google.protobuf` the
query dies at initialization
(STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).  This sandbox has
no pip-installed protobuf, but ships a pure-Python runtime inside
the system gcloud SDK.  We expose ONLY its `google/protobuf`
subtree through a shim directory (a PEP-420 namespace package with
one symlink), so none of the SDK's other top-level modules can
shadow anything.

Two details make the fallback work end-to-end:

- **Workers, not just the driver.**  Spark's Python workers are
  spawned by the JVM with the PYTHONPATH the JVM inherited at
  launch, so the shim must be exported via ``os.environ`` BEFORE the
  SparkSession is created — `session.get_spark` calls
  :func:`ensure_protobuf` first for exactly this reason.
- **Gencode/runtime minor-version skew.**  pyspark 4.1.2's generated
  `StateMessage_pb2` records gencode 6.33; the bundled runtime is
  6.32.  protobuf's strict check refuses runtime < gencode even one
  minor apart; its own documented escape hatch
  (`runtime_version.py`: ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_
  CHECK``) is set ONLY when we fall back to the bundle, never for a
  properly installed protobuf.

Override the search with ``LH_SPARK_PROTOBUF_PATH`` (a directory
containing ``google/protobuf``).
"""

from __future__ import annotations

import os
import sys

_BUNDLE_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/lib/google-cloud-sdk/lib/third_party",
)

_SHIM_DIR = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "lh-spark-protobuf-shim")


def _make_shim(bundle_google_dir: str) -> str:
    """Shim dir exposing only ``google/protobuf`` from the bundle."""
    google_dir = os.path.join(_SHIM_DIR, "google")
    link = os.path.join(google_dir, "protobuf")
    target = os.path.join(bundle_google_dir, "protobuf")
    os.makedirs(google_dir, exist_ok=True)
    if os.path.islink(link):
        if os.readlink(link) != target:
            os.unlink(link)
    if not os.path.exists(link):
        os.symlink(target, link)
    return _SHIM_DIR


def ensure_protobuf() -> bool:
    """Make `google.protobuf` importable (driver AND Spark workers)
    if at all possible; return whether it is."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    override = os.environ.get("LH_SPARK_PROTOBUF_PATH")
    candidates = ([override] if override else []) + list(_BUNDLE_CANDIDATES)
    for base in candidates:
        if not os.path.isdir(os.path.join(base, "google", "protobuf")):
            continue
        try:
            shim = _make_shim(os.path.join(base, "google"))
        except OSError:
            continue
        sys.path.insert(0, shim)
        os.environ["PYTHONPATH"] = (
            shim + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(
                os.pathsep)
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        sys.modules.pop("google", None)
        try:
            from google.protobuf import descriptor  # noqa: F401

            return True
        except ImportError:
            sys.path.remove(shim)
            continue
    return False
