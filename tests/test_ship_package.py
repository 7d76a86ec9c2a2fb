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
