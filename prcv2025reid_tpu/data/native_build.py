"""Shared build helper for the native C++ data-path libraries.

Both ctypes bindings (data/native_image.py, data/native_tokenizer.py) compile
their .cpp on demand into one per-user cache directory.  This module owns the
two behaviors they must share exactly:

- **Atomic builds**: g++ writes to a per-pid temp file which is os.replace'd
  into place, so concurrent pipeline workers racing on a cold cache can never
  observe (or persist) a partially written .so — an interrupted/timed-out
  build leaves no artifact behind.
- **Guarded freshness check**: a cached .so next to a missing or unreadable
  source file (installed tree without the .cpp, shared cache dir) is used
  as-is instead of raising out of the data path.
"""
from __future__ import annotations

import os
import subprocess
from typing import Optional, Sequence


def cache_dir() -> str:
    d = os.environ.get(
        "PRCV_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "prcv_native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def build_shared_library(
    src: str,
    so_name: str,
    extra_flags: Sequence[str] = (),
    force: bool = False,
) -> Optional[str]:
    """Compile ``src`` into ``<cache>/<so_name>`` once; path or None."""
    so_path = os.path.join(cache_dir(), so_name)
    if os.path.exists(so_path) and not force:
        try:
            fresh = os.path.getmtime(so_path) >= os.path.getmtime(src)
        except OSError:
            # Source missing/unreadable: the cached library is all we have.
            return so_path
        if fresh:
            return so_path
    if not os.path.exists(src):
        return None
    tmp_path = f"{so_path}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src,
             *extra_flags, "-o", tmp_path],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp_path, so_path)
        return so_path
    except Exception:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        return None
