"""The spark-submit --py-files artifact must stay in sync with the
package tree — a stale zip ships a pipeline missing its newest
modules (found live: dist/ds2_spark.zip lacked operators/bpe.py and
operators/spandedup.py after they landed)."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tree_modules() -> set[str]:
    mods = set()
    pkg = os.path.join(ROOT, "ds2_spark")
    for dirpath, _dirs, files in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                mods.add(os.path.relpath(full, ROOT))
    return mods


def test_zip_contains_every_package_module():
    z = zipfile.ZipFile(os.path.join(ROOT, "dist", "ds2_spark.zip"))
    names = set(z.namelist())
    missing = sorted(_tree_modules() - names)
    assert not missing, (
        f"dist/ds2_spark.zip is stale — run tools/make_pyfiles.py; "
        f"missing: {missing}"
    )


def test_zip_modules_match_tree_bytes():
    """Same set is not enough: a zip built before an edit still lists
    the file. Compare content bytes module by module."""
    z = zipfile.ZipFile(os.path.join(ROOT, "dist", "ds2_spark.zip"))
    stale = []
    for rel in sorted(_tree_modules()):
        with open(os.path.join(ROOT, rel), "rb") as f:
            on_disk = f.read()
        try:
            in_zip = z.read(rel)
        except KeyError:
            stale.append(rel)
            continue
        if in_zip != on_disk:
            stale.append(rel)
    assert not stale, (
        f"dist/ds2_spark.zip content drifted — run tools/make_pyfiles.py; "
        f"stale: {stale}"
    )
