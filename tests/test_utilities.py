"""Post-processing utilities: losummary re-binning, pull_reads extraction,
multi-sample tables, partition_fasta."""

import os

from lmat_tpu.apps.partition_fasta import partition_fasta
from lmat_tpu.reporting.losummary import losummary, read_rank_lineages
from lmat_tpu.reporting.multi_table import multi_table
from lmat_tpu.reporting.pull_reads import pull_reads

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
W = FIX + "/work"


def test_losummary(tmp_path):
    lineages = read_rank_lineages(FIX + "/taxids.info")
    base = str(tmp_path / "lo")
    fs, nm = losummary(W + "/rl_nonull0.out", lineages, 0.0, 30, base)
    rows = open(fs).read().splitlines()
    assert rows, "no summary rows"
    total = 0
    for r in rows:
        tid, rest = r.split("\t")
        name, cnt, ssum = rest.rsplit(";", 2)
        total += int(cnt)
        assert int(tid) > 0 and float(ssum) >= 0
    # re-binned totals match the fastsummary read counts
    golden_total = sum(
        int(l.split("\t")[1]) for l in open(W + "/rl_nonull.0.30.fastsummary")
    )
    assert total == golden_total


def test_pull_reads(tmp_path):
    ids = tmp_path / "ids"
    ids.write_text("32630\n9606\nLowScore 0.5\nReadTooShort\n")
    n = pull_reads(W + "/rl_nonull0.out", str(ids), 0.0, 30, str(tmp_path))
    assert n > 0
    pulled = [f for f in os.listdir(tmp_path) if ".pulled." in f]
    assert any(f.endswith(".32630") for f in pulled)
    phix = [f for f in pulled if f.endswith(".32630")][0]
    body = (tmp_path / phix).read_text()
    assert body.startswith(">") and "tid=32630" in body
    n_reads = body.count(">")
    golden_cnt = [
        l for l in open(W + "/rl_nonull.0.30.fastsummary") if "\t32630\t" in l
    ][0]
    assert n_reads == int(golden_cnt.split("\t")[1])


def test_multi_table(tmp_path):
    out = tmp_path / "table.txt"
    multi_table(
        [("s1", W + "/rl_nonull.0.30.fastsummary", 400),
         ("s2", W + "/rl_null.0.30.fastsummary", 400)],
        str(out), min_reads=1, min_score=0.0,
    )
    rows = open(out).read().splitlines()
    assert rows[0] == "Name\tTaxID\ts1\ts2"
    assert len(rows) > 5
    # species-report flavor parses too
    out2 = tmp_path / "t2.txt"
    multi_table(
        [("s1", W + "/fsreport/rl_nonull.0.30.fastsummary.species", 400)],
        str(out2), min_reads=1, min_score=0.0,
    )
    assert len(open(out2).read().splitlines()) > 2


def test_partition_fasta(tmp_path):
    n = partition_fasta(FIX + "/reads.fa", 4, str(tmp_path / "part"))
    assert n == 400
    counts = [
        open(tmp_path / f"part.{i}").read().count(">") for i in range(4)
    ]
    assert sum(counts) == 400 and max(counts) - min(counts) <= 1
