"""Build the --py-files archive for spark-submit deployment.

Usage: python scripts/make_pyfiles_zip.py [out_zip]
Packs the semantic_search_system_spark package (source only) into
build/sss_spark.zip with importable layout.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "semantic_search_system_spark"


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "build", "sss_spark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    tmp = out_zip + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(REPO, PKG)
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    os.replace(tmp, out_zip)
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
