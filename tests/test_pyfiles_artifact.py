"""Guard: the committed --py-files artifact matches the package tree.

The deploy surface (north_rule: `spark-submit --py-files
dist/nolock_ocr_spark.zip`) ships whatever is in the zip, not what is
in the repo — a stale artifact silently runs an old registry. This
test makes drift a test failure: every .py under the package must be
in the zip with IDENTICAL bytes, and the zip must contain nothing
that no longer exists in the tree. Rebuild with
`python tools/make_pyfiles.py` whenever the package changes.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "nolock_social_ocr_services_spark"
ZIP = os.path.join(REPO, "dist", "nolock_ocr_spark.zip")


def _tree_files() -> dict[str, bytes]:
    out: dict[str, bytes] = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                with open(full, "rb") as fh:
                    out[os.path.relpath(full, REPO)] = fh.read()
    return out


def test_artifact_exists():
    assert os.path.exists(ZIP), (
        "dist/nolock_ocr_spark.zip missing — run python tools/make_pyfiles.py"
    )


def test_artifact_matches_tree_exactly():
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as z:
        zipped = {n: z.read(n) for n in z.namelist() if n.endswith(".py")}
    missing = sorted(set(tree) - set(zipped))
    extra = sorted(set(zipped) - set(tree))
    assert not missing, f"package files absent from zip (stale artifact): {missing}"
    assert not extra, f"zip carries files deleted from the tree: {extra}"
    stale = sorted(n for n in tree if tree[n] != zipped[n])
    assert not stale, (
        f"zip content differs from tree for: {stale} — "
        "run python tools/make_pyfiles.py"
    )
