"""Package shipping for executors (the programmatic twin of
``spark-submit --py-files``, BASELINE.json north_star).

Local-mode python workers inherit the driver's PYTHONPATH only when the
driver happens to run from the repo; ``ensure_package_shipped`` makes the
engine location-independent by zipping ``igtdetect_spark`` once per
process and ``addPyFile``-ing it — workers then import from the shipped
archive on any cluster manager.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_shipped: dict[int, str] = {}


def package_zip_path() -> str:
    """Build (once) a zip of the igtdetect_spark package in /tmp."""
    import igtdetect_spark

    pkg_dir = os.path.dirname(os.path.abspath(igtdetect_spark.__file__))
    out = os.path.join("/tmp", "igtdetect_spark_pyfiles.zip")
    if not os.path.exists(out) or os.path.getmtime(out) < max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(pkg_dir)
        for f in fs
        if f.endswith(".py")
    ):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "igtdetect_spark", os.path.relpath(full, pkg_dir)
                    )
                    z.write(full, rel)
        os.replace(tmp, out)
    return out


def ensure_package_shipped(spark: SparkSession) -> None:
    """Idempotent per-session addPyFile of the engine package."""
    key = id(spark)
    if key in _shipped:
        return
    path = package_zip_path()
    try:
        spark.sparkContext.addPyFile(path)
    except Exception:
        # already added under the same name in this context — fine
        pass
    _shipped[key] = path
