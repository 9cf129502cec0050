"""Ship the package to executors — the spark-submit `--py-files` step,
done programmatically so every entry point (tests, gate tool, bench,
driver contract) deploys identically under any master.

Why this exists: in `local[N]` the Python workers fork on the driver
host with the driver's cwd on `sys.path`, so `import
dogsheep_beta_spark` inside an Arrow UDF accidentally works without
any deployment step.  Under a REAL executor boundary
(`local-cluster[...]`, YARN, k8s) the workers start in the executor's
own working directory and that import fails with
ModuleNotFoundError — found by the first r11 `local-cluster[2,4,4096]`
gate run (`media_mjpeg_frames`, whose frame-decode UDF imports
`functions.jpeg` executor-side).  On a 1000-executor cluster this zip
is exactly what `--py-files` would carry.
"""

from __future__ import annotations

import os
import tempfile
import zipfile


def package_zip(dest_dir: str | None = None) -> str:
    """Build (or reuse) a zip of the `dogsheep_beta_spark` package and
    return its path.  Deterministic content → safe to rebuild; one zip
    per process is cached in a temp dir keyed by pid."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    if dest_dir is None:
        dest_dir = os.path.join(
            tempfile.gettempdir(), f"dbs_pyfiles_{os.getpid()}"
        )
    os.makedirs(dest_dir, exist_ok=True)
    zpath = os.path.join(dest_dir, "dogsheep_beta_spark.zip")
    if os.path.exists(zpath):
        # content is deterministic for a given source tree, and the
        # cache is pid-keyed, so a zip this process already built is
        # the zip it would build again — skip the walk+deflate
        # (ADVICE r11: the docstring promised this; now it's true)
        return zpath
    tmp = zpath + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_root):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "dogsheep_beta_spark", os.path.relpath(full, pkg_root)
                )
                zf.write(full, rel)
    os.replace(tmp, zpath)
    return zpath


def ship_package(spark) -> None:
    """Make `dogsheep_beta_spark` importable on every executor's Python
    worker via `sc.addPyFile`.  Idempotent; cheap no-op in `local[N]`
    (where it is unnecessary but harmless)."""
    sc = spark.sparkContext
    already = getattr(sc, "_dbs_pkg_shipped", False)
    if already:
        return
    sc.addPyFile(package_zip())
    sc._dbs_pkg_shipped = True
