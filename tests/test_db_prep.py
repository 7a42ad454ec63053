import os

from lmat_tpu.apps.db_prep import (
    build_taxid_lst,
    combine_counts,
    merge_paired_reads,
    species_level_map,
)
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.reporting.gsummary import gsummary

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
W = FIX + "/work"


def test_combine_counts(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.write_text("1 5\n2 7\n")
    b.write_text("2 3\n9 1\n")
    out = tmp_path / "c"
    totals = combine_counts([str(a), str(b)], str(out))
    assert totals == {1: 5, 2: 10, 9: 1}
    assert out.read_text() == "1 5\n2 10\n9 1\n"


def test_species_level_map():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    m = species_level_map(tax)
    assert m[5621] == 562 and m[562] == 562 and m[289012] == 28901
    assert 561 not in m  # genus has no species ancestor


def test_merge_paired_reads(tmp_path):
    r1 = tmp_path / "r1.fa"
    r2 = tmp_path / "r2.fa"
    r1.write_text(">p1/1\nAAAA\n>p2/1\nCCCC\n")
    r2.write_text(">p1/2\nGGGG\n>p2/2\nTTTT\n")
    out = tmp_path / "m.fa"
    n = merge_paired_reads(str(r1), str(r2), str(out))
    assert n == 2
    assert out.read_text() == ">p1\nAAAANGGGG\n>p2\nCCCCNTTTT\n"


def test_build_taxid_lst(tmp_path):
    out = tmp_path / "tids"
    tids = build_taxid_lst(W + "/taxhisto.bin", str(out))
    assert 562 in tids and 9606 in tids
    assert len(out.read_text().splitlines()) == len(tids)


def test_gsummary(tmp_path):
    out = tmp_path / "gs"
    gsummary(W + "/gl_out0.out", 0.1, 20, str(out))
    rows = open(out).read().splitlines()
    assert rows
    for r in rows:
        avg, cnt, tid, gid = r.split("\t")
        assert float(avg) > 0.1 and int(cnt) > 0 and int(gid) >= 9000001


def test_tid16_roundtrip(tmp_path):
    from lmat_tpu.apps.db_prep import tid16_get_32bit_taxids, tid16_mapping
    from lmat_tpu.core.taxonomy import Taxonomy

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    fa = tmp_path / "g.int"
    fa.write_text(">5641\nACGT\n>289011\nGGCC\n>5641\nTTTT\n")
    lst = tmp_path / "tids.txt"
    n = tid16_get_32bit_taxids(str(fa), str(lst))
    assert n == 2
    assert lst.read_text().splitlines() == ["5641", "289011"]

    mp = tid16_mapping(str(lst), tax, str(tmp_path / "m.map"))
    assert mp[1] == 1
    # every leaf and each of its ancestors got a unique 16-bit id
    assert 5641 in mp and 289011 in mp
    path = []
    t = 5641
    while t != 1:
        path.append(t)
        t = tax.parent[t]
    assert all(p in mp for p in path)
    assert len(set(mp.values())) == len(mp)


def test_numeric_rank_table(tmp_path):
    from lmat_tpu.apps.db_prep import build_numeric_rank_table

    rows = [
        # leaf with species at the end
        "root,taxid=1,1\tspecies,taxid=562,0",
        # unranked node after genus -> genus priority + 1
        "x,taxid=1,1\tgenus,taxid=561,0\tno_rank,taxid=999,0",
        # nothing named, but intermediate nodes -> MAX_RANK (1)
        "x,taxid=1,1\tno_rank,taxid=77,0",
    ]
    src = tmp_path / "rank_ids"
    src.write_text("\n".join(rows) + "\n")
    out = tmp_path / "table"
    build_numeric_rank_table(str(src), str(out))
    got = out.read_text().splitlines()
    assert got[0] == "1 15"
    assert got[1] == "1 15"  # genus(14) + 1 for the trailing no_rank
    assert got[2] == "1 1"


def test_gi_tools(tmp_path):
    from lmat_tpu.apps.db_prep import build_header_table, get_gi_numbers

    fa = tmp_path / "ref.fa"
    fa.write_text(
        ">gi|111|ref|NC_1| some organism\nACGTACGT\n"
        ">gi|222|ref|NC_2| another\nGGGGCCCC\n"
    )
    gi = get_gi_numbers(str(fa), str(tmp_path))
    assert open(gi).read().splitlines() == ["111", "222"]

    gmap = tmp_path / "gi_taxid.dmp"
    gmap.write_text("5641\tx\tx\tx\t111\n289011\tx\tx\tx\t222\n")
    int_p, gi_tab, tid_tab, miss = build_header_table(str(fa), str(gmap), str(tmp_path))
    assert miss == 0
    assert open(int_p).read() == ">5641\nACGTACGT\n>289011\nGGGGCCCC\n"
    assert open(tid_tab).read().splitlines()[0] == "5641"


def test_combine_fast(tmp_path):
    from lmat_tpu.apps.db_prep import combine_fast

    a = tmp_path / "a"
    a.write_text("562 Escherichia;2;10\n561 g;1;5\n")
    b = tmp_path / "b"
    b.write_text("562 Escherichia;3;7\n")
    out = tmp_path / "out"
    combine_fast([str(a), str(b)], str(out))
    lines = sorted(out.read_text().splitlines())
    assert "17\t5\t562\tEscherichia" in lines
    assert "5\t1\t561\tg" in lines


def test_get_db_catalog():
    from lmat_tpu.apps.get_db import CATALOG, list_catalog

    rows = list_catalog()
    assert len(rows) == len(CATALOG) >= 8
    assert any("kML" in n for n, _, _ in rows)
