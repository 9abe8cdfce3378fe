"""Model-file resolution: cache-first, revision-aware, local-first.

Re-creates the reference's hub layer (lib/informers/utils/hub.rb:118-220:
get_model_file / get_model_json; FileCache :70-104; settings
lib/informers.rb) for the Spark deployment model: the DRIVER resolves
files once (download/cache), then ships the resolved directory to
executors via spark-submit --files/--archives or a shared mount —
executors never touch the network (the executor-singleton backend just
opens the staged paths).

Offline-safe: downloads are import-guarded urllib and only attempted
when allow_remote_models is True AND the file is neither local nor
cached; this sandbox always resolves locally.
"""

from __future__ import annotations

import json
import os

# module-level settings, mirroring the reference's Informers module attrs
# (lib/informers.rb: allow_remote_models / cache_dir / remote_host)
allow_local_models = True
allow_remote_models = True
remote_host = "https://huggingface.co/"
remote_path_template = "{model}/resolve/{revision}"


def dispatch_callback(progress_callback, data: dict) -> None:
    """utils/core.rb:3-7 — call the callback with an event dict if set."""
    if progress_callback is not None:
        progress_callback(data)


def default_cache_dir() -> str:
    return os.environ.get(
        "INFORMERS_SPARK_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "informers_spark"),
    )


class FileCache:
    """Filesystem cache keyed by the request path (hub.rb:70-104):
    resolve_path maps a cache key to a stable on-disk location; match
    checks presence; put writes bytes atomically."""

    def __init__(self, path: str):
        self.path = path

    def resolve_path(self, key: str) -> str:
        return os.path.join(self.path, *key.split("/"))

    def match(self, key: str) -> str | None:
        p = self.resolve_path(key)
        return p if os.path.exists(p) else None

    def put(self, key: str, data: bytes) -> str:
        p = self.resolve_path(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".incomplete"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)
        return p


def get_model_file(
    path_or_repo_id: str,
    filename: str,
    fatal: bool = True,
    cache_dir: str | None = None,
    revision: str = "main",
    local_files_only: bool = False,
    progress_callback=None,
) -> str | None:
    """→ local filesystem path of the resolved file.

    Resolution order (hub.rb:118-210):
    1. local model dir (allow_local_models): path_or_repo_id/filename
    2. filesystem cache — key is repo/filename for the main revision,
       repo/revision/filename otherwise (hub.rb:143-145)
    3. remote download → cache put (skipped when local_files_only or
       allow_remote_models is False; fatal=False returns None instead of
       raising, the reference's optional-file path, hub.rb:168-177)

    progress_callback receives the reference's event dicts
    (hub.rb:119-124 initiate, get_file's download/progress at :56-64,
    :207-212 done with cache_hit). DRIVER-side only — executors read
    pre-staged dirs and never call this.
    """
    dispatch_callback(
        progress_callback,
        {"status": "initiate", "name": path_or_repo_id, "file": filename},
    )
    if allow_local_models:
        local = os.path.join(path_or_repo_id, filename)
        if os.path.exists(local):
            dispatch_callback(
                progress_callback,
                {"status": "done", "name": path_or_repo_id, "file": filename,
                 "cache_hit": True},
            )
            return local
    cache = FileCache(cache_dir or default_cache_dir())
    fs_cache_key = (
        f"{path_or_repo_id}/{filename}"
        if revision == "main"
        else f"{path_or_repo_id}/{revision}/{filename}"
    )
    hit = cache.match(fs_cache_key)
    if hit is not None:
        dispatch_callback(
            progress_callback,
            {"status": "done", "name": path_or_repo_id, "file": filename,
             "cache_hit": True},
        )
        return hit
    if local_files_only or not allow_remote_models:
        if fatal:
            raise FileNotFoundError(
                f"local_files_only/allow_remote_models forbids download and "
                f"'{filename}' was not found locally at "
                f"{cache.resolve_path(fs_cache_key)!r}"
            )
        return None
    url = (
        remote_host.rstrip("/")
        + "/"
        + remote_path_template.replace("{model}", path_or_repo_id).replace(
            "{revision}", revision
        )
        + "/"
        + filename
    )
    try:
        from urllib.request import urlopen

        with urlopen(url, timeout=60) as resp:  # driver-side only
            # streamed read with the reference's download/progress events
            # (hub.rb get_file content_length_proc/progress_proc, :56-64)
            info = {"name": path_or_repo_id, "file": filename}
            total = resp.headers.get("Content-Length")
            total = int(total) if total else None
            dispatch_callback(
                progress_callback,
                {"status": "download", **info, "total_size": total},
            )
            chunks, got = [], 0
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                chunks.append(chunk)
                got += len(chunk)
                dispatch_callback(
                    progress_callback,
                    {"status": "progress", **info, "size": got, "total_size": total},
                )
            data = b"".join(chunks)
    except Exception as e:  # no network / 404
        if fatal:
            raise FileNotFoundError(f"could not resolve {url}: {e}") from e
        return None
    path = cache.put(fs_cache_key, data)
    dispatch_callback(
        progress_callback,
        {"status": "done", "name": path_or_repo_id, "file": filename,
         "cache_hit": False},
    )
    return path


def get_model_json(
    model_path: str, file_name: str, fatal: bool = True, **options
) -> dict:
    """File → parsed JSON; missing optional file → {} (hub.rb:212-220)."""
    path = get_model_file(model_path, file_name, fatal, **options)
    if path is None:
        return {}
    with open(path) as f:
        return json.load(f)
