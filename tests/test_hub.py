"""Hub resolution tests: local-first, cache-key revisions, optional-file
semantics (reference hub.rb:118-220) — all offline."""

import json
import os

import pytest

from informers_spark.sources import hub


def test_local_model_dir_wins(tmp_path):
    d = tmp_path / "mymodel"
    d.mkdir()
    (d / "config.json").write_text('{"model_type": "bert"}')
    got = hub.get_model_file(str(d), "config.json", cache_dir=str(tmp_path / "cache"))
    assert got == str(d / "config.json")


def test_cache_hit_and_revision_keys(tmp_path):
    cache = hub.FileCache(str(tmp_path / "cache"))
    cache.put("org/repo/tokenizer.json", b"{}")
    got = hub.get_model_file(
        "org/repo", "tokenizer.json", cache_dir=str(tmp_path / "cache"),
        local_files_only=True,
    )
    assert got and got.endswith(os.path.join("org", "repo", "tokenizer.json"))
    # a pinned revision uses a different key (hub.rb:143-145)
    with pytest.raises(FileNotFoundError):
        hub.get_model_file(
            "org/repo", "tokenizer.json", cache_dir=str(tmp_path / "cache"),
            revision="v2", local_files_only=True,
        )
    cache.put("org/repo/v2/tokenizer.json", b"{}")
    got2 = hub.get_model_file(
        "org/repo", "tokenizer.json", cache_dir=str(tmp_path / "cache"),
        revision="v2", local_files_only=True,
    )
    assert got2 and "v2" in got2


def test_optional_file_returns_none_and_json_empty(tmp_path):
    got = hub.get_model_file(
        "org/repo", "missing.json", fatal=False,
        cache_dir=str(tmp_path / "cache"), local_files_only=True,
    )
    assert got is None
    assert hub.get_model_json(
        "org/repo", "missing.json", fatal=False,
        cache_dir=str(tmp_path / "cache"), local_files_only=True,
    ) == {}


def test_get_model_json_parses(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"id2label": {"0": "NEG", "1": "POS"}}))
    cfg = hub.get_model_json(str(d), "config.json", cache_dir=str(tmp_path / "c"))
    assert cfg["id2label"]["1"] == "POS"


def test_put_is_atomic_no_incomplete_left(tmp_path):
    cache = hub.FileCache(str(tmp_path))
    p = cache.put("a/b/c.bin", b"xyz")
    assert open(p, "rb").read() == b"xyz"
    assert not os.path.exists(p + ".incomplete")


def test_progress_callback_cache_hit_events(tmp_path):
    # initiate → done(cache_hit: true) for a cached file (hub.rb:119-124,
    # :207-212)
    cache = hub.FileCache(str(tmp_path / "cache"))
    cache.put("org/repo/config.json", b"{}")
    events = []
    hub.get_model_file(
        "org/repo", "config.json", cache_dir=str(tmp_path / "cache"),
        local_files_only=True, progress_callback=events.append,
    )
    assert [e["status"] for e in events] == ["initiate", "done"]
    assert events[0]["name"] == "org/repo" and events[0]["file"] == "config.json"
    assert events[1]["cache_hit"] is True


def test_progress_callback_download_events(tmp_path, monkeypatch):
    # fake a streamed remote: download → progress* → done(cache_hit: false)
    # (hub.rb get_file :56-64)
    import io

    class FakeResp(io.BytesIO):
        headers = {"Content-Length": "4"}

        def __init__(self):
            super().__init__(b"data")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def get(self, k, default=None):  # pragma: no cover
            return self.headers.get(k, default)

    class H(dict):
        def get(self, k, d=None):
            return {"Content-Length": "4"}.get(k, d)

    resp = FakeResp()
    resp.headers = H()
    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", lambda *a, **k: resp)
    events = []
    got = hub.get_model_file(
        "org/repo2", "model.bin", cache_dir=str(tmp_path / "cache"),
        progress_callback=events.append,
    )
    assert got and open(got, "rb").read() == b"data"
    statuses = [e["status"] for e in events]
    assert statuses[0] == "initiate" and statuses[1] == "download"
    assert "progress" in statuses and statuses[-1] == "done"
    prog = [e for e in events if e["status"] == "progress"][-1]
    assert prog["size"] == 4 and prog["total_size"] == 4
    assert events[-1]["cache_hit"] is False


def test_pipeline_ready_callback():
    from informers_spark.api import pipeline

    events = []
    fn = pipeline("embedding", backend="hash", progress_callback=events.append)
    assert callable(fn)
    assert events == [{"status": "ready", "task": "embedding", "model": "hash"}]
