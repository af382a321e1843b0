"""Build the --py-files archive for cluster submission.

    python tools/make_pyfiles.py [out.zip]

Produces ``usgs_geomag_algorithms_spark.zip`` (package sources only, no
tests/caches) suitable for

    spark-submit --py-files usgs_geomag_algorithms_spark.zip \
        jobs/run_cascade.py ...

The zip is deterministic (sorted entries, zeroed timestamps) so repeated
builds are byte-identical — CI can cache/diff it.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "usgs_geomag_algorithms_spark"


def build(out_path: str) -> list[str]:
    entries = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return [a for a, _ in entries]


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, f"{PKG}.zip")
    names = build(out)
    print(f"{out}: {len(names)} files, {os.path.getsize(out)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
