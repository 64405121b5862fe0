#!/bin/sh
# Package the engine for spark-submit --py-files (north rule shipping form):
#   ./scripts/make_dist.sh && spark-submit --py-files dist/engine.zip jobs/build_index.py ...
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
python - <<'PY'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("search_engine_spark/**/*")):
        if p.is_file() and "__pycache__" not in str(p):
            z.write(p, p.as_posix())
print("dist/engine.zip written")
PY
