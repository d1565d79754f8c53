"""Package shipping: build a zip of textindexing_spark and addPyFile it so
Python workers can import the engine regardless of the driver's cwd. The
same zip is what ``spark-submit --py-files`` takes (BASELINE.md launch
mode)."""

from __future__ import annotations

import os
import zipfile

_SHIPPED_SESSIONS: set[int] = set()


def package_zip(dest: str = "/tmp/textindexing_spark.zip") -> str:
    """Zip the package source tree (deterministic content order)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return dest


def ensure_shipped(spark) -> None:
    """Make the engine importable on executors (idempotent per session)."""
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        # local-mode sessions whose workers share the driver's sys.path
        # don't need the zip; addPyFile can also reject duplicates.
        pass
    _SHIPPED_SESSIONS.add(key)
