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


def test_pull_headers_and_fq(tmp_path):
    """FASTQ retrieval with qualities (pull_reads_fq.pl / pull_headers step
    of pull_reads_fq_mc.sh): headers selected from a .out file key the
    original FASTQ records back out, qualities intact."""
    from lmat_tpu.reporting.pull_reads import (
        pull_headers,
        pull_reads_fq,
        pull_reads_fq_pipeline,
    )

    # synthesize the FASTQ the .out file came from: header = read name,
    # seq = the read column, qual = 'I' run (a few quality lines start
    # with '@' to exercise the reference's header-line quirk)
    out_file = W + "/rl_nonull0.out"
    fq = tmp_path / "reads.fq"
    n_reads = 0
    with open(out_file) as f, open(fq, "w") as o:
        for line in f:
            vals = line.rstrip("\n").split("\t")
            if len(vals) < 2 or vals[1] == "X":
                continue
            q = "I" * len(vals[1])
            if n_reads % 7 == 3:
                q = "@" + q[1:]  # quality line starting with '@'
            o.write(f"@{vals[0]}\n{vals[1]}\n+\n{q}\n")
            n_reads += 1

    ids = tmp_path / "ids"
    ids.write_text("32630\n")
    n_sel = pull_headers(out_file, str(ids), 0.0, 30, str(tmp_path))
    assert n_sel > 0
    hdr_file = [f for f in os.listdir(tmp_path) if f.endswith(".pulled.32630")]
    assert len(hdr_file) == 1
    hdrs = (tmp_path / hdr_file[0]).read_text().splitlines()
    assert len(hdrs) == n_sel and all("\t" not in h for h in hdrs)

    fq_out = tmp_path / "pulled.fastq"
    n_fq = pull_reads_fq(str(tmp_path / hdr_file[0]), str(fq), str(fq_out))
    assert n_fq == n_sel
    rec = fq_out.read_text().splitlines()
    # every selected record came back with its sequence + qualities;
    # records whose quality line starts with '@' lose the tail lines
    # (reference behavior: every '@'-line is treated as a header test)
    assert rec[0].startswith("@") and rec[0][1:] in set(hdrs)
    assert rec[1] and set(rec[1]) <= set("ACGTN")
    got_hdrs = [l[1:] for l in rec if l.startswith("@") and l[1:] in set(hdrs)]
    assert sorted(got_hdrs) == sorted(hdrs)

    # the full mc-wrapper flow: headers -> merged .headers -> .fastq
    odir = tmp_path / "mc"
    odir.mkdir()
    last = pull_reads_fq_pipeline([out_file], str(ids), str(fq), 0.0, 30,
                                  str(odir))
    assert last.endswith(".fastq") and os.path.exists(last)
    merged = last.replace(".fastq", ".headers")
    assert open(merged).read().splitlines() == hdrs
    assert open(last).read() == fq_out.read_text()


def test_genusspecies2html_matches_reference(tmp_path):
    """Byte-identical drill-down HTML vs the reference's own
    bin/genusspecies2html.py run on the same inputs (the script is pure
    Python).  Inputs use the 4+4-column report layout the script parses
    (4 species columns, strain rows appending 4 more; headerless)."""
    import io
    import subprocess
    import sys

    import pytest

    ref = "/root/reference/bin/genusspecies2html.py"
    if not os.path.exists(ref):
        pytest.skip("reference script not available")

    from lmat_tpu.reporting.html_report import genusspecies2html

    rank = tmp_path / "rank.txt"
    rank.write_text(
        "ktaxid=10,taxid=10,d=1\tViruses\tsuperkingdom,Viruses\n"
        "ktaxid=11,taxid=11,d=2\tViruses\tspecies,VirSp\n"
        "ktaxid=20,taxid=20,d=1\tcellular organisms\tkingdom,Bacteria\n"
        "ktaxid=21,taxid=21,d=2\tcellular organisms\tkingdom,Bacteria\tspecies,BacSp\n"
        "ktaxid=22,taxid=22,d=3\tcellular organisms\tkingdom,Bacteria\tstrain,BacStr\n"
        "ktaxid=30,taxid=30,d=1\tcellular organisms\tEukaryota\tx\tFungi\n"
        "ktaxid=40,taxid=40,d=2\tcellular organisms\tEukaryota\tHomo sapiens\n"
        "ktaxid=50,taxid=50,d=2\tplasmids\tx\tplasmid pXYZ\n"
    )
    species = tmp_path / "sp"
    species.write_text(
        "900.5\t42\t21\tname,BacSp\t800.1\t30\t22\tname,BacStr\textra\n"
        "500.0\t12\t11\tVirSp\n"
        "100.0\t3\t40\tHomoSap\n"
        "50.0\t2\t50\tplasmidX\n"
    )
    genus = tmp_path / "gen"
    genus.write_text(
        "700.0\t55\t20\tBacGenus\n"
        "60.0\t5\t30\tFunGenus\n"
        "10.0\t1\t10\tVirGenus\n"
    )

    want = subprocess.run(
        [sys.executable, ref, str(species), str(genus), str(rank)],
        capture_output=True, text=True, check=True,
    ).stdout
    buf = io.StringIO()
    genusspecies2html(str(species), str(genus), str(rank), buf)
    assert buf.getvalue() == want
