"""The committed --py-files zip must match the source tree.

Round-2 advisor finding: the committed dist/data_check_spark.zip was stale
vs the committed sources, so a spark-submit run silently shipped old code
(a transcript_wer NULL-coalesce fix was missing). This test diffs every
zip member's bytes against the tree and fails with the member list when
they diverge — the fix is `python tools/package_pyfiles.py`.
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "data_check_spark.zip")
PKG = os.path.join(REPO, "data_check_spark")


def _tree_members() -> dict[str, bytes]:
    out = {}
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                with open(full, "rb") as f:
                    out[os.path.relpath(full, REPO)] = f.read()
    return out


def test_dist_zip_matches_source_tree():
    assert os.path.exists(ZIP), "dist/data_check_spark.zip missing — run tools/package_pyfiles.py"
    tree = _tree_members()
    with zipfile.ZipFile(ZIP) as z:
        zipped = {n: z.read(n) for n in z.namelist() if n.endswith(".py")}
    missing = sorted(set(tree) - set(zipped))
    extra = sorted(set(zipped) - set(tree))
    stale = sorted(n for n in set(tree) & set(zipped) if tree[n] != zipped[n])
    assert not (missing or extra or stale), (
        f"dist zip out of date — rerun tools/package_pyfiles.py. "
        f"missing={missing} extra={extra} stale={stale}"
    )
