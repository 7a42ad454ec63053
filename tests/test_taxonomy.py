import textwrap

import pytest

from lmat_tpu.core.taxonomy import Taxonomy


def write_tree(tmp_path):
    # A small tree:
    # 1 -> 2 -> 10 -> {100, 101}; 1 -> 3 -> 20 -> 200
    content = textwrap.dedent(
        """\
        header line one
        header line two
        7
        1 2 2 3 1
        root
        2 1 10 1
        bacteria
        3 1 20 1
        viruses
        10 2 100 101 2
        genusA
        100 0 10
        speciesA1
        101 0 10
        speciesA2
        20 1 200 3
        genusB
        200 0 20
        speciesB1
        """
    )
    p = tmp_path / "tree.dat"
    p.write_text(content)
    return str(p)


def test_parse_and_paths(tmp_path):
    t = Taxonomy.from_lmat_file(write_tree(tmp_path))
    assert t.path_to_root(100) == (10, 2, 1)
    assert t.path_to_root(1) == ()
    assert t.is_ancestor(2, 100)
    assert not t.is_ancestor(100, 100)  # a node is not its own ancestor
    assert not t.is_ancestor(3, 100)
    assert t.names[10] == "genusA"


def test_lca(tmp_path):
    t = Taxonomy.from_lmat_file(write_tree(tmp_path))
    assert t.lca({100, 101}) == 10
    assert t.lca({100, 200}) == 1
    assert t.lca({100}) == 100
    assert t.lca({100, 10}) == 10
    assert t.lca({99999}) == 0xFFFFFFFF  # single unknown tid
    assert t.lca({100, 99999}) == 100  # unknown dropped


def test_dense(tmp_path):
    t = Taxonomy.from_lmat_file(write_tree(tmp_path))
    t.depth.update({1: 0, 2: 1, 3: 1, 10: 2, 20: 2, 100: 3, 101: 3, 200: 3})
    tids, index, parent_idx, depth, path_mat = t.dense()
    assert list(tids) == [1, 2, 3, 10, 20, 100, 101, 200]
    i100 = index[100]
    got = [int(tids[j]) for j in path_mat[i100] if j >= 0]
    assert got == [10, 2, 1]
    assert depth[i100] == 3
    assert parent_idx[index[1]] == index[1]
