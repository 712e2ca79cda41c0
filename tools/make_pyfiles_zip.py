"""Package tlgs_spark into a zip for spark-submit --py-files."""

from __future__ import annotations

import os
import sys
import zipfile


def make_zip(out_path: str = "tlgs_spark.zip", root: str | None = None) -> str:
    root = root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "tlgs_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(make_zip(sys.argv[1] if len(sys.argv) > 1 else "tlgs_spark.zip"))
