"""Zip the deduce_spark package for spark-submit --py-files.

    python jobs/package_pyfiles.py [dest.zip]   # default dist/kgspark.zip
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(dest: Path | None = None) -> Path:
    dest = dest or REPO / "dist" / "kgspark.zip"
    dest.parent.mkdir(parents=True, exist_ok=True)
    src = REPO / "deduce_spark"
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(src.rglob("*.py")):
            zf.write(p, p.relative_to(REPO).as_posix())
        for p in sorted(src.rglob("*.json")):
            zf.write(p, p.relative_to(REPO).as_posix())
        for p in sorted(src.rglob("*.txt")):
            zf.write(p, p.relative_to(REPO).as_posix())
    return dest


if __name__ == "__main__":
    out = build(Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    print(out)
