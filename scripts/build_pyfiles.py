#!/usr/bin/env python3
"""Build dist/web_graph_spark.zip for ``spark-submit --py-files``.

The north_rule launch shape is ``spark-submit --py-files`` on a
multi-executor cluster; this produces the artifact.  Zip contents are
written deterministically (sorted names, fixed timestamps) so the
artifact hash is reproducible for deploy audits.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "web_graph_spark")
DIST = os.path.join(REPO, "dist")


def build(out: str | None = None) -> str:
    out = out or os.path.join(DIST, "web_graph_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in entries:
            with open(full, "rb") as fh:
                info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
                info.external_attr = 0o644 << 16
                z.writestr(info, fh.read())
    return out


if __name__ == "__main__":
    print(build())
