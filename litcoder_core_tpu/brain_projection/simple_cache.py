"""Surface-projection cache keyed on md5(subject:path:mtime)
(reference: encoding/brain_projection/simple_cache.py:14-105).

Stores .npy instead of pickle (faster load, mmap-able), keeps the module-
level singleton accessor."""

import hashlib
import logging
import os
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


class SimpleSurfaceCache:
    """Caches processed (time, vertices) surface matrices per NIfTI file."""

    def __init__(self, cache_dir: str = "surface_cache"):
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)

    def _key(self, subject: str, volume_path: str) -> str:
        mtime = os.path.getmtime(volume_path) if os.path.exists(
            volume_path
        ) else 0
        raw = f"{subject}:{volume_path}:{mtime}"
        return hashlib.md5(raw.encode()).hexdigest()

    def _path(self, key: str) -> Path:
        return self.cache_dir / f"{key}.npy"

    def get(self, subject: str, volume_path: str) -> Optional[np.ndarray]:
        path = self._path(self._key(subject, volume_path))
        if path.exists():
            logger.info("Surface cache hit: %s", path)
            return np.load(path)
        return None

    def set(self, subject: str, volume_path: str, data: np.ndarray) -> None:
        path = self._path(self._key(subject, volume_path))
        np.save(path, np.asarray(data))
        logger.info("Surface cache store: %s", path)

    def clear(self) -> None:
        for p in self.cache_dir.glob("*.npy"):
            p.unlink()


_GLOBAL_CACHE: Optional[SimpleSurfaceCache] = None


def get_surface_cache(cache_dir: str = "surface_cache") -> SimpleSurfaceCache:
    """Module-level singleton (reference: simple_cache.py:94-105)."""
    global _GLOBAL_CACHE
    if _GLOBAL_CACHE is None:
        _GLOBAL_CACHE = SimpleSurfaceCache(cache_dir)
    return _GLOBAL_CACHE
