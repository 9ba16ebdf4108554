#!/usr/bin/env python3
"""Build dist/pqc.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    pkg = os.path.join(REPO, "pqc")
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "pqc.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.join("pqc", os.path.relpath(full, pkg)))
    print(out)


if __name__ == "__main__":
    main()
