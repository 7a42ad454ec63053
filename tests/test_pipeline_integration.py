"""End-to-end pipeline over two samples through the CLI surfaces:
partition -> run-rl per sample -> gene-label -> content-summ -> multi-sample
table + BIOM, using fixture runtime inputs."""

import os
import subprocess
import sys

import pytest

from lmat_tpu.apps.partition_fasta import partition_fasta
from lmat_tpu.reporting.biom import fastsummary_to_biom
from lmat_tpu.reporting.multi_table import multi_table

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


def cli(args, cwd):
    r = subprocess.run(
        [sys.executable, "-m", "lmat_tpu.cli.main"] + args,
        cwd=cwd, capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(__file__))},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.mark.slow
def test_two_sample_pipeline(tmp_path):
    # build db once
    cli(["make-db", "-i", FIX + "/work/taxhisto.bin", "-o", str(tmp_path / "db"),
         "--tax-histo", "-k", "20", "--max-tids", "8"], str(tmp_path))
    # split the fixture into two samples
    partition_fasta(FIX + "/reads.fa", 2, str(tmp_path / "sample"))
    summaries = []
    for i in range(2):
        odir = tmp_path / f"s{i}"
        odir.mkdir()
        cli(["--lmat-dir", FIX, "run-rl", "--db_file", str(tmp_path / "db"),
             "--query_file", str(tmp_path / f"sample.{i}"),
             "--odir", str(odir), "--min_read_kmer", "30"], str(tmp_path))
        fs = [f for f in os.listdir(odir) if f.endswith(".fastsummary")]
        assert fs, os.listdir(odir)
        summaries.append((f"s{i}", str(odir / fs[0]), 200))
        # rank reports generated
        assert any(f.endswith(".species") for f in os.listdir(odir))
        # gene pass on the .out file
        outf = [f for f in os.listdir(odir) if f.endswith("0.out")][0]
        cli(["gene-label", "-l", str(odir / outf), "-d", FIX + "/work/genekmers.0",
             "-g", FIX + "/gene_names.txt.gz", "-o", str(odir / "gl")], str(tmp_path))
        assert os.path.exists(odir / "gl.0.1.20.genesummary")
        # content summarization
        cli(["--lmat-dir", FIX, "content-summ", "-f", str(odir / outf),
             "-l", str(odir / fs[0]), "-o", str(odir / "cs.summ")], str(tmp_path))
        assert os.path.exists(odir / "cs.summ")
        assert os.path.exists(odir / "cs.summ.ordered.species")

    # cross-sample outputs
    table = multi_table(summaries, str(tmp_path / "table.txt"), min_score=0.0)
    rows = open(table).read().splitlines()
    assert rows[0] == "Name\tTaxID\ts0\ts1" and len(rows) > 5
    biom = fastsummary_to_biom(
        [(n, p) for n, p, _ in summaries], str(tmp_path / "t.biom")
    )
    assert os.path.getsize(biom) > 200

    # the two samples' read counts add up to the full fixture's
    total = 0
    for _, p, _ in summaries:
        total += sum(int(l.split("\t")[1]) for l in open(p))
    golden = sum(
        int(l.split("\t")[1]) for l in open(FIX + "/work/rl_nonull.0.30.fastsummary")
    )
    assert total == golden


def test_batch_run_multi_sample(tmp_path):
    """Multi-sample launcher (the pyLMAT_rl capability, SURVEY.md §2.2):
    one outdir per sample, full run-rl chain per sample, restart skip."""
    import argparse
    import os
    import shutil

    from lmat_tpu.apps.batch_run import batch_run, discover_samples
    from lmat_tpu.apps.make_db import build_from_tax_histo

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
    db = tmp_path / "db"
    build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8).save(str(db))
    samples = tmp_path / "samples"
    samples.mkdir()
    shutil.copy(FIX + "/reads.fa", samples / "sampleA.fa")
    with open(FIX + "/reads.fa") as f:
        head = "".join([next(f) for _ in range(40)])
    (samples / "sampleB.fa").write_text(head)

    found = discover_samples(str(samples))
    assert [n for n, _ in found] == ["sampleA", "sampleB"]

    # sample sheet flavor too
    sheet = tmp_path / "sheet.tsv"
    sheet.write_text(f"sa\t{samples/'sampleA.fa'}\n")
    assert discover_samples(str(sheet)) == [("sa", str(samples / "sampleA.fa"))]

    args = argparse.Namespace(
        path=str(samples), db=str(db), odir=str(tmp_path / "out"),
        min_score=0.0, min_read_kmer=30, sdiff=1.0, hbias=0.0,
        nullm=FIX + "/null_lst.txt", mode="exact", batch=512,
        max_candidates=128, overwrite=False, gene_db=None, gene_table=None,
        lmat_dir=FIX, tax_tree=None, depth=None, rank_file=None, rank_ids=None,
    )
    done = batch_run(args)
    assert len(done) == 2
    outA = tmp_path / "out" / "sampleA"
    got = (outA / "sampleA.fa.db.lo.rl_output0.out").read_bytes()
    want = open(FIX + "/work/rl_null0.out", "rb").read()
    assert got == want  # per-sample run == the single-run golden
    assert (outA / "sampleA.fa.db.lo.rl_output.0.30.fastsummary.species").exists()
    # restart guard: a second run skips both samples
    done2 = batch_run(args)
    assert len(done2) == 2


def test_batch_run_input_validation(tmp_path):
    """Review-fix regressions: duplicate sample basenames across
    subdirectories are rejected up front (the restart guard would silently
    drop the later ones), and --gene-db without --gene-table fails before
    the expensive classify pass."""
    import argparse
    import os
    import shutil

    import pytest

    from lmat_tpu.apps.batch_run import batch_run

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
    samples = tmp_path / "s"
    (samples / "d1").mkdir(parents=True)
    (samples / "d2").mkdir(parents=True)
    shutil.copy(FIX + "/reads.fa", samples / "d1" / "reads.fa")
    shutil.copy(FIX + "/reads.fa", samples / "d2" / "reads.fa")

    base = dict(
        path=str(samples), db="unused", odir=str(tmp_path / "out"),
        min_score=0.0, min_read_kmer=30, sdiff=1.0, hbias=0.0, nullm=None,
        mode="exact", batch=512, max_candidates=128, overwrite=False,
        gene_db=None, gene_table=None, lmat_dir=FIX, tax_tree=None,
        depth=None, rank_file=None, rank_ids=None,
    )
    with pytest.raises(SystemExit, match="duplicate sample names"):
        batch_run(argparse.Namespace(**base))
    with pytest.raises(SystemExit, match="--gene-db requires --gene-table"):
        batch_run(argparse.Namespace(**{**base, "gene_db": "g.db"}))


def test_pull_reads_fq_pipeline_path_with_pulled_dir(tmp_path):
    """Review-fix regression: an output directory whose PATH contains
    'pulled' (or a rl_output-like component) must not be rewritten by the
    merge-name shortening."""
    import os

    from lmat_tpu.reporting.pull_reads import pull_reads_fq_pipeline

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
    W = FIX + "/work"
    out_file = W + "/rl_nonull0.out"
    fq = tmp_path / "r.fq"
    with open(out_file) as f, open(fq, "w") as o:
        for line in f:
            vals = line.rstrip("\n").split("\t")
            if len(vals) < 2 or vals[1] == "X":
                continue
            o.write(f"@{vals[0]}\n{vals[1]}\n+\n{'I' * len(vals[1])}\n")
    ids = tmp_path / "ids"
    ids.write_text("32630\n")
    odir = tmp_path / "pulled_runs"
    odir.mkdir()
    last = pull_reads_fq_pipeline([out_file], str(ids), str(fq), 0.0, 30,
                                  str(odir))
    assert last.startswith(str(odir)) and os.path.exists(last)
    assert open(last).read().count("@") >= 1
