"""Build the --py-files artifact for spark-submit deployment.

Zips the ``webcrawlerfull_spark`` package (source only, no caches) into
``dist/webcrawlerfull_spark.zip``. On a real cluster the whole engine
ships as this one zip:

    spark-submit --master <cluster> \
        --py-files dist/webcrawlerfull_spark.zip \
        submit_crawl.py --catalog <path> ...

Usage: python tools/package_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "webcrawlerfull_spark"


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    src_root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(src_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_zip


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
