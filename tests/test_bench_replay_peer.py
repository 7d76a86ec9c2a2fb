"""ReplayPeer per-query timeout resilience (ADVICE r10): one stalled
replay query must skip only itself — the peer stays alive, its late
reply is dropped rather than attributed to the next query, and _die is
reserved for pipe/EOF failures."""
from __future__ import annotations

import queue

import bench


def _bare_peer(monkeypatch) -> bench.ReplayPeer:
    monkeypatch.setenv("SPARK_GRAFT_NO_REPLAY", "1")  # skip _spawn
    peer = bench.ReplayPeer("/root/testdata/sf0.001")
    peer.error = None
    peer._proc = object()           # "alive"
    peer._queue = queue.Queue()
    peer.have = {"a", "b"}
    monkeypatch.setattr(peer, "_send", lambda obj: True)
    return peer


def test_query_timeout_keeps_peer_alive_and_drops_straggler(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_REPLAY_QUERY_TIMEOUT", "0.2")
    peer = _bare_peer(monkeypatch)

    # Query "a" stalls: no reply within the timeout.
    assert peer.time_query("a") is None
    assert peer._proc is not None, "timeout must not kill the peer"
    assert "a" in peer._stale

    # The straggler reply for "a" lands later, then "b"'s real reply —
    # the straggler must be dropped, not returned for "b".
    peer._queue.put({"type": "timing", "query": "a", "sec": 99.0})
    peer._queue.put({"type": "timing", "query": "b", "sec": 1.5})
    assert peer.time_query("b") == 1.5
    assert "a" not in peer._stale  # consumed exactly once


def test_two_consecutive_timeouts_mean_a_wedged_peer(monkeypatch):
    """A single stall skips one query; a SECOND timeout in a row means
    the serial runner is stuck — burning every remaining query's full
    timeout against it helps nobody, so the peer dies."""
    monkeypatch.setenv("SPARK_GRAFT_REPLAY_QUERY_TIMEOUT", "0.2")
    peer = _bare_peer(monkeypatch)
    assert peer.time_query("a") is None
    assert peer._proc is not None
    assert peer.time_query("b") is None
    assert peer._proc is None  # dead: the runner is wedged
    assert peer.error  # first failure recorded for partial_error


def test_peer_exit_still_dies(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_REPLAY_QUERY_TIMEOUT", "30")
    peer = _bare_peer(monkeypatch)
    peer._queue.put(None)  # EOF sentinel from the pump thread
    assert peer.time_query("a") is None
    assert peer._proc is None  # EOF is fatal, as before
