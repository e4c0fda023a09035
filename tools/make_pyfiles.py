"""Package surfactant_spark for ``spark-submit --py-files``.

The north rule's deployment shape is a spark-submit job shipping the
engine as a zip; this builds ``dist/surfactant_spark.zip`` (source
only, deterministic order, no bytecode) from the repo checkout.

Usage: python tools/make_pyfiles.py [out_zip]
Prints the zip path.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", "surfactant_spark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    pkg = os.path.join(REPO, "surfactant_spark")
    entries = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                entries.append((full, os.path.relpath(full, REPO)))
    entries.sort(key=lambda e: e[1])
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            # fixed timestamp → byte-identical zip for identical sources
            zi = zipfile.ZipInfo(arc, (1980, 1, 1, 0, 0, 0))
            with open(full, "rb") as f:
                zf.writestr(zi, f.read())
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
