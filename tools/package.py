"""Build the --py-files zip for cluster submission.

    python tools/package.py              # writes dist/tstore_spark.zip
    spark-submit --py-files dist/tstore_spark.zip jobs/rollup_job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "dist/tstore_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out_path = os.path.join(root, out)
    pkg = os.path.join(root, "tstore_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fname in sorted(filenames):
                if fname.endswith(".py"):
                    full = os.path.join(dirpath, fname)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "dist/tstore_spark.zip")
    print(path)
