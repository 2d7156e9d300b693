"""Walker stress tests (reference: the C recursion at krep.c:3310-3445).

The walker must use an explicit stack: a Python-recursive walk dies at the
interpreter recursion limit (~1000 frames) on tree depths the reference's
C recursion handles fine.
"""

import io
import os

from krep_tpu.io import walker
from krep_tpu.params import SearchParams

# ~1500 levels of 1-char dirs: 3000-char paths stay under Linux PATH_MAX
# (4096) but blow well past Python's default recursion limit.
DEPTH = 1500


def _build_deep_tree(root: str) -> str:
    path = root
    for _ in range(DEPTH):  # os.makedirs is itself recursive — build manually
        path = os.path.join(path, "d")
        os.mkdir(path)
    leaf = os.path.join(path, "leaf.txt")
    with open(leaf, "w") as f:
        f.write("needle in the deep\n")
    return leaf


def test_deep_tree_iter_files(tmp_path):
    leaf = _build_deep_tree(str(tmp_path))
    found = [p for p, _ in walker.iter_files(str(tmp_path))]
    assert found == [leaf]


def test_deep_tree_search(tmp_path):
    _build_deep_tree(str(tmp_path))
    params = SearchParams(patterns=(b"needle",), count_mode=True)
    out = io.BytesIO()
    rc = walker.search_directory(params, str(tmp_path), out, color=False)
    assert rc == 0
    assert out.getvalue().endswith(b":1\n")


def test_deep_tree_gitignore_chain(tmp_path):
    # gitignore contexts chain parent-ward through every frame; make sure a
    # root-level ignore still applies at the bottom of a deep stack.
    leaf = _build_deep_tree(str(tmp_path))
    with open(tmp_path / ".gitignore", "w") as f:
        f.write("*.txt\n")
    assert leaf in [p for p, _ in walker.iter_files(str(tmp_path))]
    found = [p for p, _ in walker.iter_files(str(tmp_path), use_gitignore=True)]
    assert leaf not in found
