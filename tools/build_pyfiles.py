"""Build dist/osmgraft.zip for `spark-submit --py-files`.

Zips the osmgraft package (source only, no tests/caches) so executors can
import it. Usage: python tools/build_pyfiles.py [outdir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(outdir: str | None = None) -> str:
    outdir = outdir or os.path.join(REPO, "dist")
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, "osmgraft.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "osmgraft")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if fn.endswith(".py") or fn.endswith(".json"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else None)
