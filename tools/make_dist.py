"""Package the engine for spark-submit --py-files (north_rule run
path):

    python tools/make_dist.py
    spark-submit --py-files dist/engine.zip jobs/annotate.py ...

Pure-Python package, no compiled artifacts — the zip is importable
directly by executors.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "dbpedia_spotlight_db_spark"


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "engine.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / PKG).rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
