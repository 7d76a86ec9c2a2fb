"""`ship_package` content-addressed naming (r12 A/B postmortem).

Spark executors cache fetched files BY NAME and fail any task whose
re-fetch mismatches the cached copy ("exists and does not match
contents"), so the pyfiles zip's name must change whenever the
package's source bytes do — a fixed name broke the interleaved bench
the moment HEAD and the ReplayPeer's snapshot worktree shared one
host.
"""
from __future__ import annotations

import pathlib
import zipfile

import old_original_java_little_horse_spark as pkg
from old_original_java_little_horse_spark.session import ship_package


class _FakeContext:
    def __init__(self):
        self.added: list[str] = []

    def addPyFile(self, path: str) -> None:
        self.added.append(path)


class _FakeSession:
    def __init__(self):
        self.sparkContext = _FakeContext()


def test_zip_name_is_content_addressed_and_idempotent():
    s = _FakeSession()
    ship_package(s)
    assert len(s.sparkContext.added) == 1
    path = pathlib.Path(s.sparkContext.added[0])
    assert path.exists()
    # name carries a 16-hex content digest, not a fixed string
    stem = path.stem
    assert "_pyfiles-" in stem
    digest = stem.rsplit("-", 1)[1]
    assert len(digest) == 16 and int(digest, 16) >= 0
    # idempotent per session: a second call adds nothing
    ship_package(s)
    assert len(s.sparkContext.added) == 1
    # a different session object re-derives the SAME name for the
    # same tree (cache shared across processes of one tree)
    s2 = _FakeSession()
    ship_package(s2)
    assert s2.sparkContext.added == [str(path)]
    # the zip actually contains the package's modules, importable as
    # old_original_java_little_horse_spark/...
    pkg_name = pathlib.Path(pkg.__file__).resolve().parent.name
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
    assert f"{pkg_name}/session.py" in names
    assert f"{pkg_name}/registry.py" in names


def test_stale_sibling_gc_is_age_gated():
    """ADVICE r12: superseded-digest zips and crash-orphaned .tmp
    files must be collected on the next build — but ONLY hours-old
    ones, because Spark serves an addPyFile'd zip from its original
    path and a concurrently-live peer session (the interleaved A/B)
    may have shipped a different-digest sibling minutes ago."""
    import os
    import time

    s = _FakeSession()
    ship_package(s)
    path = pathlib.Path(s.sparkContext.added[0])
    base = path.parent / path.stem.rsplit("-", 1)[0]
    old_zip = pathlib.Path(f"{base}-{'0' * 16}.zip")
    old_tmp = pathlib.Path(f"{base}-{'1' * 16}.4242.tmp")
    fresh_zip = pathlib.Path(f"{base}-{'2' * 16}.zip")
    for p in (old_zip, old_tmp, fresh_zip):
        p.write_bytes(b"stale")
    now = time.time()
    os.utime(old_zip, (now - 7 * 3600, now - 7 * 3600))  # past 6h limit
    os.utime(old_tmp, (now - 2 * 3600, now - 2 * 3600))  # past 1h limit
    try:
        path.unlink()  # force a rebuild so the GC sweep runs
        ship_package(_FakeSession())
        assert path.exists()
        assert not old_zip.exists(), "hours-old superseded zip survived GC"
        assert not old_tmp.exists(), "crash-orphaned .tmp survived GC"
        assert fresh_zip.exists(), "GC deleted a minutes-old live sibling"
    finally:
        fresh_zip.unlink(missing_ok=True)
        old_zip.unlink(missing_ok=True)
        old_tmp.unlink(missing_ok=True)
