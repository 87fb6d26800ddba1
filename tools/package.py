"""Build dist/quiver_spark.zip for spark-submit --py-files.

Pure-stdlib, deterministic (fixed timestamps so the archive sha256 is
stable for a given tree — the same reproducibility discipline as the
engine's seeded generators).

Usage: python tools/package.py [--out dist/quiver_spark.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    pkg = os.path.join(ROOT, "quiver_spark")
    entries = []
    for dirpath, _dirnames, filenames in os.walk(pkg):
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, ROOT)))
    entries.sort(key=lambda t: t[1])
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "dist", "quiver_spark.zip"))
    args = ap.parse_args()
    path = build(args.out)
    print(path)


if __name__ == "__main__":
    main()
