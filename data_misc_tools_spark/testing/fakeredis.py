"""File-backed Redis fake.

State lives in a JSON file so writes made inside Spark's Python worker
processes are observable from the test process (a plain dict would be
per-process). Locking is a best-effort fcntl lock — sufficient for
test concurrency levels.
"""

from __future__ import annotations

import fnmatch
import json
import os


class FakeRedis:
    def __init__(self, path: str) -> None:
        self.path = path
        if not os.path.exists(path):
            self._dump({})

    # -- storage helpers -------------------------------------------------
    def _load(self) -> dict[str, str]:
        with open(self.path) as f:
            return json.load(f)

    def _dump(self, data: dict[str, str]) -> None:
        tmp = self.path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, self.path)

    def _locked(self, fn):
        import fcntl

        with open(self.path + ".lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                data = self._load()
                result = fn(data)
                self._dump(data)
                return result
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)

    # -- redis-py compatible subset --------------------------------------
    def get(self, k):
        return self._load().get(k)

    def mget(self, keys):
        data = self._load()
        return [data.get(k) for k in keys]

    def set(self, k, v, nx=False, xx=False, ex=None):
        def op(data):
            exists = k in data
            if (nx and exists) or (xx and not exists):
                return None
            data[k] = v
            return True

        return self._locked(op)

    def mset(self, mapping):
        def op(data):
            data.update({k: str(v) for k, v in mapping.items()})
            return True

        return self._locked(op)

    def delete(self, *keys):
        def op(data):
            n = 0
            for k in keys:
                if k in data:
                    del data[k]
                    n += 1
            return n

        return self._locked(op)

    def keys(self, pattern="*"):
        return [k for k in self._load() if fnmatch.fnmatch(k, pattern)]

    def scan_iter(self, match="*"):
        yield from self.keys(match)

    def close(self):
        pass


def fake_redis_factory(path: str):
    """Picklable zero-arg factory for the operators' client injection."""

    def make():
        return FakeRedis(path)

    return make
