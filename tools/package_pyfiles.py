"""Build the --py-files artifact: dist/xutil_spark.zip containing the
package (sources only, no tests/caches), suitable for

    spark-submit --py-files dist/xutil_spark.zip tools/submit_job.py \
        [sf_dir] [query ...]

on any cluster master — the deployment path the north rule names.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "xutil_spark.zip")
    pkg = os.path.join(ROOT, "xutil_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith((".py", ".json")):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
