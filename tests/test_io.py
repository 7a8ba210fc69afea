"""gs:// path handling in utils.io, exercised against a fake gfile backend.

The real backend is tensorflow.io.gfile (reference routed ALL IO through it,
utils.py:116-120); these tests verify our dispatch layer routes gs:// URIs to
the backend and local paths to the stdlib, without needing GCS.
"""

import io as _io

import pytest

from speech_recognition_tpu.utils import io


class FakeGFile:
    """In-memory gfile lookalike (GFile/glob/makedirs/copy/exists)."""

    def __init__(self):
        self.files = {}
        self.dirs = set()

    def GFile(self, path, mode="r"):
        if "w" in mode:
            buf = _io.BytesIO() if "b" in mode else _io.StringIO()
            close = buf.close
            buf.close = lambda: (self.files.__setitem__(path, buf.getvalue()), close())
            return buf
        data = self.files[path]
        return _io.BytesIO(data) if "b" in mode else _io.StringIO(data)

    def glob(self, pattern):
        prefix = pattern.split("*")[0]
        return [p for p in self.files if p.startswith(prefix)]

    def makedirs(self, path):
        self.dirs.add(path)

    def copy(self, src, dst, overwrite=True):
        if not overwrite and dst in self.files:
            raise FileExistsError(dst)
        self.files[dst] = self.files[src]

    def exists(self, path):
        return path in self.files or path in self.dirs


@pytest.fixture()
def fake_gfile(monkeypatch):
    fake = FakeGFile()
    monkeypatch.setattr(io, "_gfile", lambda: fake)
    return fake


def test_path_join_remote_and_local():
    assert io.path_join("gs://bucket/dir", "sub", "f.txt") == "gs://bucket/dir/sub/f.txt"
    assert io.path_join("gs://bucket/dir/", "f.txt") == "gs://bucket/dir/f.txt"
    import os

    assert io.path_join("a", "b") == os.path.join("a", "b")


def test_open_write_read_remote(fake_gfile):
    with io.open_file("gs://b/x.txt", "w") as f:
        f.write("hello")
    assert fake_gfile.files["gs://b/x.txt"] == "hello"
    with io.open_file("gs://b/x.txt") as f:
        assert f.read() == "hello"


def test_glob_remote(fake_gfile):
    fake_gfile.files["gs://b/data/a.tsv"] = ""
    fake_gfile.files["gs://b/data/b.tsv"] = ""
    fake_gfile.files["gs://b/other.tsv"] = ""
    assert io.glob("gs://b/data/*.tsv") == ["gs://b/data/a.tsv", "gs://b/data/b.tsv"]


def test_copy_and_exists_remote(fake_gfile):
    fake_gfile.files["gs://b/src"] = "payload"
    io.copy("gs://b/src", "gs://b/dst")
    assert fake_gfile.files["gs://b/dst"] == "payload"
    assert io.exists("gs://b/dst") and not io.exists("gs://b/nope")
    io.makedirs("gs://b/outdir")
    assert io.exists("gs://b/outdir")


def test_local_paths_never_touch_backend(tmp_path, monkeypatch):
    def _boom():
        raise AssertionError("local path routed to GCS backend")

    monkeypatch.setattr(io, "_gfile", _boom)
    p = tmp_path / "f.txt"
    with io.open_file(str(p), "w") as f:
        f.write("x")
    assert io.exists(str(p))
    assert io.glob(str(tmp_path / "*.txt")) == [str(p)]


def test_remote_without_backend_raises(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_tf(name, *a, **k):
        if name.startswith("tensorflow"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_tf)
    with pytest.raises(NotImplementedError, match="gs://"):
        io.open_file("gs://b/x", "r")
