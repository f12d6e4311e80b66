"""Build katta_spark.zip for `spark-submit --py-files`.

Usage: python tools/package.py [out.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "katta_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "katta_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
