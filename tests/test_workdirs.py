"""plans/workdirs.py: deterministic per-input work dirs — reuse, staleness
GC, crash-safe cached builds. Pure filesystem tests."""

import os

from tika_xapian_spark.plans import workdirs as W


def _touch(p, content="x"):
    with open(p, "w") as f:
        f.write(content)


def test_same_input_same_dir(tmp_path):
    src = str(tmp_path / "in.parquet")
    _touch(src)
    a = W.work_dir("t1", src)
    b = W.work_dir("t1", src)
    assert a == b and os.path.isdir(a)


def test_changed_input_new_dir_and_gc(tmp_path):
    src = str(tmp_path / "in2.parquet")
    _touch(src, "one")
    a = W.work_dir("t2", src)
    _touch(src, "different-size-content")
    b = W.work_dir("t2", src)
    assert a != b
    assert not os.path.exists(a)  # stale sibling for the purpose removed
    assert os.path.isdir(b)


def test_fresh_wipes(tmp_path):
    src = str(tmp_path / "in3.parquet")
    _touch(src)
    d = W.work_dir("t3", src)
    marker = os.path.join(d, "junk")
    _touch(marker)
    d2 = W.work_dir("t3", src, fresh=True)
    assert d2 == d and not os.path.exists(marker)


def test_cached_build_builds_once_and_recovers_partial(tmp_path):
    src = str(tmp_path / "in4.parquet")
    _touch(src)
    calls = []

    def build(d):
        calls.append(d)
        _touch(os.path.join(d, "artifact"))

    d1 = W.cached_build("t4", src, build)
    d2 = W.cached_build("t4", src, build)
    assert d1 == d2 and len(calls) == 1  # marker short-circuits
    # simulate a crash mid-build: marker missing, partial state present
    os.remove(os.path.join(d1, W._MARKER))
    _touch(os.path.join(d1, "partial_junk"))
    d3 = W.cached_build("t4", src, build)
    assert d3 == d1 and len(calls) == 2  # rebuilt
    assert not os.path.exists(os.path.join(d1, "partial_junk"))  # wiped first
    assert os.path.exists(os.path.join(d1, "artifact"))


def test_alternating_purposes_rebuild_cleanly(tmp_path):
    """Alternating two inputs under one purpose: each switch GCs the other's
    dir, and cached_build transparently rebuilds (the consumer-side handle
    staleness is covered by _ann_index's marker-mtime check)."""
    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    _touch(a, "aaa")
    _touch(b, "bbbb")
    calls = []

    def build(d):
        calls.append(d)
        _touch(os.path.join(d, "artifact"))

    da1 = W.cached_build("t5", a, build)
    db1 = W.cached_build("t5", b, build)   # GCs a's dir
    assert not os.path.exists(da1)
    da2 = W.cached_build("t5", a, build)   # rebuilds a
    assert da2 == da1 and os.path.exists(os.path.join(da2, "artifact"))
    assert len(calls) == 3
