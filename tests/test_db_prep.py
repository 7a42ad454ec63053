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
