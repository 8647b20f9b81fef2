"""Concurrency safety of the executor py-files zip (session._package_zip).

The zip lands at a FIXED path in the temp dir so addPyFile is stable, but
two sessions building at once (parallel pytest workers, two drivers on one
host) must never let a reader observe a half-written file: the build goes
to a unique temp name and is moved into place with an atomic os.replace.
"""

from __future__ import annotations

import concurrent.futures
import zipfile

from ufo_dedup_spark.session import _package_zip


def test_package_zip_valid():
    path = _package_zip()
    with zipfile.ZipFile(path) as zf:
        assert zf.testzip() is None
        names = zf.namelist()
    assert "ufo_dedup_spark/session.py" in names
    assert "ufo_dedup_spark/pipeline.py" in names


def test_package_zip_concurrent_builds_never_corrupt():
    """Hammer the builder from 8 threads; every returned path (they all
    alias the same final file) must be a complete, valid zip at every
    observation point — os.replace guarantees readers see old-complete or
    new-complete, never truncated."""
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        paths = list(ex.map(lambda _i: _package_zip(), range(16)))
    assert len(set(paths)) == 1
    with zipfile.ZipFile(paths[0]) as zf:
        assert zf.testzip() is None
        assert "ufo_dedup_spark/session.py" in zf.namelist()
