"""Metadata CRUD for spec-type resources: WFSpec, TaskDef,
ExternalEventDef.

The reference registers each of these as a POSTable GETable
(`J/api/LittleHorseAPI.java:58-66`) with the validate → store → index
lifecycle on POST (`J/api/metadata/POSTApi.java:40-58`: deserialize,
`t.validate(config)`, assign objectId, produce to the resource's
entry topic, block on `waitForProcessing`, read back).  GETs resolve
by id with a by-name alias fallback (`LHDatabaseClient.getByNameOrId`)
and list/alias routes (`GETApi.java:26-40`).

Spark-first sizing call: spec metadata is control-plane — KBs of
documents with single-row access patterns, nothing a distributed scan
helps with.  So the store is an **event-sourced JSONL changelog**
(the entry topic) compacted into an in-memory latest-wins map (the
RocksDB store), replayed on construction — the same
produce → materialize → serve motion as the reference, without
pretending a driver-side dict is a data-plane table.  The data-plane
equivalents (run snapshots, alias index) live in `sinks/serving.py`
as real bucket-partitioned parquet stores.

`processChange` side-effects (`POSTable.java:15-41` — the reference
deploys a WFSpec's scheduler topology when one is POSTed) are exposed
as the `on_change` callback; `api/http_server.py` wires it to the
engine manager so POST /wfSpec → deployed continuous query.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from pathlib import Path
from typing import Any, Callable

from ..sdk.builder import validate_spec

KINDS = ("wfSpec", "taskDef", "externalEventDef")


class MetadataError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


def _validate(kind: str, doc: dict) -> dict:
    """Reference `validate(config)` per resource type; returns the doc
    with identity fields filled (objectId assignment happens before
    save, POSTApi.java:49-52)."""
    if not isinstance(doc, dict):
        raise MetadataError(400, "body must be a JSON object")
    name = doc.get("name")
    if not name or not isinstance(name, str):
        raise MetadataError(400, f"{kind} requires a string 'name'")
    doc = dict(doc)
    if kind == "wfSpec":
        doc.setdefault("id", f"{name}-{uuid.uuid4().hex[:8]}")
        try:
            validate_spec(doc)
        except (ValueError, KeyError, TypeError) as e:
            raise MetadataError(400, f"invalid WFSpec: {e}") from e
    else:
        # TaskDef.objectId == name (TaskDef.java:34-37); likewise
        # ExternalEventDef (ExternalEventDef.java:13-15).
        if doc.setdefault("id", name) != name:
            raise MetadataError(400, f"{kind} id must equal name")
        if kind == "taskDef" and not isinstance(
                doc.setdefault("required_vars", {}), dict):
            raise MetadataError(400, "taskDef required_vars must be an object")
    return doc


class MetadataStore:
    """validate → store → index lifecycle over an event-sourced log.

    Thread-safe (the HTTP server handles requests concurrently); every
    mutation appends one changelog record before the in-memory map
    moves, so a restart replays to the same state (read-your-writes is
    trivial: the map IS the materialization, updated synchronously —
    the reference needs `waitForProcessing` only because its store
    materializes asynchronously behind Kafka).
    """

    def __init__(self, meta_dir: str,
                 on_change: Callable[[str, dict, dict | None], None] | None = None):
        self.meta_dir = Path(meta_dir)
        self.meta_dir.mkdir(parents=True, exist_ok=True)
        self._log = self.meta_dir / "metadata.jsonl"
        self._lock = threading.Lock()
        self._docs: dict[tuple[str, str], dict] = {}     # (kind, id) → doc
        self._by_name: dict[tuple[str, str], str] = {}   # (kind, name) → id
        self.on_change = on_change
        # Monotonic mutation counter, captured UNDER the store lock
        # (ADVICE r9): on_change fires outside the lock, so two
        # concurrent mutations of the same name can reach the consumer
        # in the opposite order from the changelog — the seq lets the
        # consumer detect and drop the stale one instead of deploying
        # an older spec over a newer.  In-process only; boot replay
        # redeploys from the final store state, not from events.
        self._seq = 0
        self._replay()

    def _replay(self) -> None:
        if not self._log.exists():
            return
        data = self._log.read_bytes()
        # Only complete lines are replayed: a crash mid-append leaves a
        # torn final line WITHOUT its newline, and that record was
        # never acknowledged (post() appends + fsyncs before
        # returning), so dropping it is correct — crashing on it would
        # permanently prevent server boot.  The torn tail is also
        # TRUNCATED away: the log is append-only, so leaving it would
        # merge it with the next post()'s record into one malformed
        # line that bricks the boot after this one.  Corruption in an
        # earlier, newline-terminated record is real log damage and
        # still raises: silently skipping it would resurrect deleted
        # specs or drop live ones.
        cut = data.rfind(b"\n")
        if cut + 1 < len(data):
            with self._log.open("r+b") as f:
                f.truncate(cut + 1)
                f.flush()
                os.fsync(f.fileno())
        if cut < 0:
            return
        for line in data[: cut + 1].splitlines():
            if not line.strip():
                continue
            rec = json.loads(line)
            self._apply(rec["op"], rec["kind"], rec["doc"])

    def _apply(self, op: str, kind: str, doc: dict) -> None:
        key = (kind, doc["id"])
        if op == "DELETE":
            old = self._docs.pop(key, None)
            if old is not None:
                self._by_name.pop((kind, old.get("name", "")), None)
        else:
            # A re-POST keeping the id but changing the name must drop
            # the old name's alias, or GET-by-old-name keeps resolving
            # and a later POST legitimately reusing that name 409s
            # against an entry that is actually free (replay included).
            prior = self._docs.get(key)
            if prior is not None and prior.get("name") != doc["name"]:
                self._by_name.pop((kind, prior.get("name", "")), None)
            self._docs[key] = doc
            self._by_name[(kind, doc["name"])] = doc["id"]

    def _append(self, op: str, kind: str, doc: dict) -> None:
        rec = json.dumps({"op": op, "kind": kind, "doc": doc},
                         separators=(",", ":"))
        # fsync before acknowledging: the 200/201 the client gets back
        # is a durability promise (the reference's produce blocks on
        # the Kafka ack).  Without it, a power loss can lose a POSTed
        # spec the caller was told is stored — and whose engine is
        # already running, so the next boot serves a topology its
        # metadata no longer knows.
        with self._log.open("a") as f:
            f.write(rec + "\n")
            f.flush()
            os.fsync(f.fileno())

    # -- POST / DELETE (POSTApi.java:40-58, 90-??) --------------------------

    def post(self, kind: str, doc: dict) -> dict:
        if kind not in KINDS:
            raise MetadataError(404, f"unknown resource type {kind!r}")
        doc = _validate(kind, doc)
        doc.setdefault("created", int(time.time() * 1000))
        with self._lock:
            old = self._docs.get((kind, doc["id"]))
            other = self._by_name.get((kind, doc["name"]))
            if other is not None and other != doc["id"]:
                raise MetadataError(
                    409, f"{kind} name {doc['name']!r} already used by id {other}")
            self._append("PUT", kind, doc)
            self._apply("PUT", kind, doc)
            self._seq += 1
            seq = self._seq
        if self.on_change is not None:
            self._fire_on_change(kind, doc, old, seq)  # processChange(old)
        return doc

    def delete(self, kind: str, obj_id: str) -> dict:
        with self._lock:
            doc = self._docs.get((kind, obj_id))
            if doc is None:
                raise MetadataError(404, f"{kind} {obj_id} not found")
            self._append("DELETE", kind, doc)
            self._apply("DELETE", kind, doc)
            self._seq += 1
            seq = self._seq
        if self.on_change is not None:
            self._fire_on_change(kind, None, doc, seq)
        return doc

    def _fire_on_change(self, kind: str, new: dict | None,
                        old: dict | None, seq: int) -> None:
        """Invoke on_change with the lock-captured seq when the
        callback accepts it; 3-arg callbacks (tests, simple consumers)
        keep working without ordering protection."""
        import inspect
        try:
            takes_seq = len(inspect.signature(
                self.on_change).parameters) >= 4
        except (TypeError, ValueError):
            takes_seq = False
        if takes_seq:
            self.on_change(kind, new, old, seq)
        else:
            self.on_change(kind, new, old)

    # -- GET (GETApi.java:26-40; LHDatabaseClient.getByNameOrId) ------------

    def get(self, kind: str, id_or_name: str) -> dict:
        with self._lock:
            doc = self._docs.get((kind, id_or_name))
            if doc is None:
                by_name = self._by_name.get((kind, id_or_name))
                if by_name is not None:
                    doc = self._docs.get((kind, by_name))
        if doc is None:
            raise MetadataError(404, f"{kind} {id_or_name} not found")
        return doc

    def get_alias(self, kind: str, key: str, value: str) -> list[dict]:
        """Alias search (GET /wfSpecAlias/{key}/{value}); `name` is the
        one index every spec-type GETable declares (GETable.getAliases)."""
        with self._lock:
            return [d for (k, _), d in self._docs.items()
                    if k == kind and str(d.get(key)) == value]

    def get_all(self, kind: str) -> list[dict]:
        if kind not in KINDS:
            raise MetadataError(404, f"unknown resource type {kind!r}")
        with self._lock:
            return sorted((d for (k, _), d in self._docs.items() if k == kind),
                          key=lambda d: d["id"])
