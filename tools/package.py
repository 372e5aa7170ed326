"""Build dist/inxs_spark.zip for spark-submit --py-files
(BASELINE.json:14). Pure-source zip — no compiled artifacts."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = None) -> str:
    out = out or os.path.join(ROOT, "dist", "inxs_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(ROOT, "inxs_spark")
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                zf.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
