"""Progress stores — the reference's ``meilisync/progress/*`` surface
(file store ``progress/file.py``, redis store ``progress/redis.py:19-23``)
re-homed for the Spark execution model.

Division of labor, stated precisely because it differs from the
reference: the *resume position* — which events a restart may skip —
lives in the stream's ``checkpointLocation`` and nowhere else (T1;
offsets commit after each batch, and deriving resume state from a side
store would let the two disagree under crashes). What the reference's
progress store additionally provides — a place where operators,
dashboards, and the ``check`` workflow read "how far has the sync
applied?" WITHOUT talking to the engine — is genuinely useful at any
scale, so the pipeline publishes the latest applied position per sync
after each committed micro-batch. The store is an **ops mirror**:
losing it costs nothing (the next batch republishes), staleness is
bounded by one trigger interval, and it is never read on the resume
path.

Both stores share the reference's tiny contract: ``set(**positions)``
merges key→value pairs, ``get()`` returns the current mapping (``{}``
when nothing was ever published — the reference returns ``None``;
callers here always iterate, so the empty dict is the friendlier
null).
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile


class ProgressStore:
    """Abstract store: merge-write positions, read them back."""

    def set(self, **positions) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def get(self) -> dict:  # pragma: no cover - interface
        raise NotImplementedError


class FileProgress(ProgressStore):
    """JSON-file store (≡ meilisync/progress/file.py).

    Two deliberate upgrades over the reference's plain ``open(..., "w")``:
    writes are atomic (tmp file + ``os.replace`` — a crash mid-write
    can never tear the JSON a dashboard is reading), and ``set`` merges
    into the existing mapping instead of replacing it, so independent
    syncs publishing at different batch cadences don't erase each
    other's positions.

    ``os.replace`` protects *readers*; concurrent *writers* sharing one
    path would still interleave the read-merge-replace and drop each
    other's keys, so ``set`` takes an advisory ``flock`` on a sidecar
    lock file for the whole merge (a no-op cost when there is only one
    writer, which is the expected deployment: one pipeline per progress
    path). On filesystems without flock (some NFS mounts) the lock
    degrades to best-effort — keep one writer per path there.
    """

    def __init__(self, path: str = "progress.json"):
        self.path = path

    @contextlib.contextmanager
    def _locked(self, d: str):
        try:
            import fcntl
        except ImportError:  # pragma: no cover - non-posix
            yield
            return
        lock_path = os.path.join(d, ".progress.lock")
        with open(lock_path, "w") as lk:
            try:
                fcntl.flock(lk, fcntl.LOCK_EX)
            except OSError:  # pragma: no cover - flock-less filesystem
                pass
            yield

    def set(self, **positions) -> None:
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        with self._locked(d):
            merged = self.get()
            merged.update(positions)
            fd, tmp = tempfile.mkstemp(prefix=".progress-", dir=d)
            try:
                with os.fdopen(fd, "w") as fh:
                    json.dump(merged, fh)
                os.replace(tmp, self.path)
            except BaseException:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise

    def get(self) -> dict:
        try:
            with open(self.path) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}


class RedisProgress(ProgressStore):
    """Redis-hash store (≡ meilisync/progress/redis.py:19-23 —
    ``hmset``/``hgetall`` on one key), synchronous client. Import-gated:
    constructing without the ``redis`` package raises immediately with
    an actionable message rather than failing on first ``set`` mid-
    pipeline. Values come back as strings (redis hashes are stringly
    typed — same as the reference's ``decode_responses=True``)."""

    def __init__(
        self,
        dsn: str = "redis://localhost:6379/0",
        key: str = "meilisync:progress",
    ):
        try:
            import redis  # type: ignore
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "progress.type=redis needs the 'redis' package "
                "(pip install redis) — or use progress.type=file"
            ) from e
        self.key = key
        self._r = redis.Redis.from_url(dsn, decode_responses=True)

    def set(self, **positions) -> None:  # pragma: no cover - needs server
        self._r.hset(self.key, mapping={k: str(v) for k, v in positions.items()})

    def get(self) -> dict:  # pragma: no cover - needs server
        return self._r.hgetall(self.key)


def make_progress(cfg) -> ProgressStore | None:
    """Build a store from ``Settings.progress`` (None → no mirror).

    ``cfg.type`` routes exactly like the reference's
    ``get_progress(settings.progress.type)`` discovery
    (meilisync/main.py:45-47); unknown types fail loudly at startup.
    """
    if cfg is None:
        return None
    if cfg.type == "file":
        return FileProgress(path=cfg.path)
    if cfg.type == "redis":
        return RedisProgress(dsn=cfg.dsn, key=cfg.key)
    raise ValueError(f"unknown progress type: {cfg.type!r} (file | redis)")
