#!/usr/bin/env python
"""Build dist/company_name_matching_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "company_name_matching_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = ROOT / "company_name_matching_spark"
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
