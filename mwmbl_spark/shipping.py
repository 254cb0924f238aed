"""Ship the mwmbl_spark package to executors at runtime.

Local-mode workers usually resolve the package via the JVM's working
directory, but a driver harness may create its SparkSession from any
cwd. ``ensure_shipped`` zips the package once and registers it with
``sc.addPyFile`` — the runtime equivalent of ``spark-submit
--py-files mwmbl_spark.zip`` — so cloudpickled pandas UDFs can import
their defining modules on any worker.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_SESSIONS: set[int] = set()
_ZIP_PATH: str | None = None


def _build_zip() -> str:
    global _ZIP_PATH
    if _ZIP_PATH and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, path = tempfile.mkstemp(prefix="mwmbl_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "mwmbl_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    _ZIP_PATH = path
    return path


def ensure_shipped(spark) -> None:
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    try:
        spark.sparkContext.addPyFile(_build_zip())
    except Exception:  # noqa: BLE001 — e.g. Connect sessions; workers
        pass  # then rely on PYTHONPATH/cwd resolution
    _SHIPPED_SESSIONS.add(key)
