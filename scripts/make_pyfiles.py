"""Build .build/gregor_spark.zip for spark-submit --py-files."""

import os
import sys
import zipfile

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
build = os.path.join(repo, ".build")
os.makedirs(build, exist_ok=True)
zpath = os.path.join(build, "gregor_spark.zip")
with zipfile.ZipFile(zpath, "w") as zf:
    pkg = os.path.join(repo, "gregor_spark")
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, repo))
print(zpath)
sys.exit(0)
