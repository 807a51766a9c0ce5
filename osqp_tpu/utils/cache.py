"""Persistent-compile-cache helper (shared by tests and tools).

jax's file cache writes entries NON-atomically (lru_cache.py put():
plain write_bytes) — a run killed mid-write (timeout/Ctrl-C) leaves a
truncated executable that SEGFAULTS the deserializer on the next run's
cache *read*.  ``enable_compile_cache`` turns the cache on for the
current process AND patches put() to write-to-temp + os.replace (atomic
on the same filesystem), which also makes the cache safe for multiple
concurrent processes (the multi-host workers compile identical
programs): a killed or racing write leaves only an ignored temp file.
"""

from __future__ import annotations

import os
import tempfile


def _atomic_put(self, key, val):
    from jax._src import lru_cache as _lru

    if not key:
        raise ValueError("key cannot be empty")
    cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
    if cache_path.exists():
        return
    fd, tmp = tempfile.mkstemp(dir=str(self.path), prefix=".inflight-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(val)
        os.replace(tmp, str(cache_path))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def enable_compile_cache(path: str | None = None) -> str:
    """Enable jax's persistent compilation cache at ``path`` (default:
    $OSQP_TPU_TEST_CACHE or /tmp/osqp_tpu_xla_cache) with atomic,
    multi-process-safe writes.  Returns the cache dir."""
    import jax
    from jax._src import lru_cache as _lru

    cache_dir = path or os.environ.get(
        "OSQP_TPU_TEST_CACHE", "/tmp/osqp_tpu_xla_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _lru.LRUCache.put = _atomic_put
    return cache_dir
