"""Byte-identical replay of the reference's own shipped example outputs.

The reference ships its de-facto integration test in example/example.tgz:
1000 real SRR443846 reads plus the complete post-classification artifact
chain.  The classify step needs the unavailable 18 GB marker DB, but every
downstream stage takes the shipped .out/.fastsummary files as input; the
runtime tree/rank inputs are reconstructed from the shipped artifacts
themselves (tools/example_replay.py, validated there against the reference's
own bin scripts).

This is the only real-LMAT-data evidence obtainable in this environment and
cross-checks the synthetic-fixture goldens: .fastsummary/.nomatchsum
accumulation, tolineage, fsreport (gene-augmented), summary (.ordered.*),
and content_summ's read-side counting are each compared byte-for-byte
against the shipped files (ref: bin/run_rl.sh:244-253, bin/run_cs.sh:141-151).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import example_replay  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(example_replay.EXAMPLE_TGZ),
    reason="reference example.tgz not available",
)


@pytest.fixture(scope="module")
def ex(tmp_path_factory):
    work = tmp_path_factory.mktemp("example_replay")
    exdir = example_replay.extract(str(work))
    paths = example_replay.reconstruct(exdir, str(work / "lmat_dir"))
    paths["out_files"] = [
        os.path.join(exdir, example_replay.FS_BASE[: -len(".0.30.fastsummary")] + f"{i}.out")
        for i in range(8)
    ]
    paths["gsfile"] = os.path.join(
        exdir, example_replay.GL_BASE + ".0.1.20.genesummary.min_tax_score.0"
    )
    paths["odir"] = str(work / "out")
    os.makedirs(paths["odir"], exist_ok=True)
    return paths


def _ship(paths, suffix):
    return open(paths["fastsummary"] + suffix, "rb").read()


def test_fastsummary_and_nomatchsum_regen(ex):
    from lmat_tpu.reporting.losummary import fastsummary_from_out

    fs = os.path.join(ex["odir"], "regen.fastsummary")
    nm = os.path.join(ex["odir"], "regen.nomatchsum")
    fastsummary_from_out(ex["out_files"], ex["rank_ids"], fs, nm,
                         min_score=0.0, min_kmers=30)
    # .nomatchsum regenerates byte-identically; the .fastsummary score sums
    # cannot (the .out files print scores at 6 significant digits, which
    # does not round-trip the reference's internal float32 accumulation),
    # so scores compare to text precision and everything else byte-exactly
    ship_nm = ex["fastsummary"][: -len(".fastsummary")] + ".nomatchsum"
    assert open(nm, "rb").read() == open(ship_nm, "rb").read()
    got = [l.split("\t") for l in open(fs).read().splitlines()]
    want = [l.split("\t") for l in open(ex["fastsummary"]).read().splitlines()]
    assert len(got) == len(want)
    import math

    for g, w in zip(got, want):
        assert g[1:] == w[1:]  # count, taxid, rank-name: byte-exact, in order
        # scores agree to the last printed digit +-1 (both print 6
        # significant digits; sums can straddle a rounding boundary) plus
        # the float32 random-walk error of re-accumulating n re-rounded
        # per-read scores (~sqrt(n) * eps32 * sum)
        fw, n = float(w[0]), int(w[1])
        quantum = 10.0 ** (math.floor(math.log10(abs(fw))) - 5) if fw else 1e-6
        tol = 1.01 * quantum + 4 * 6e-8 * abs(fw) * math.sqrt(n)
        assert abs(float(g[0]) - fw) <= tol, (g[0], w[0])


def test_tolineage_example(ex):
    from lmat_tpu.reporting.tolineage import tolineage

    out = os.path.join(ex["odir"], "lineage")
    tolineage(ex["rank_ids"], ex["fastsummary"], out, 10, 0.0)
    assert open(out, "rb").read() == _ship(ex, ".lineage")


def test_fsreport_example(ex):
    from lmat_tpu.reporting.fsreport import TaxFiles, fsreport

    tf = TaxFiles(ex["taxtree"], ex["ranks"], ex["plasmids"], ex["plasmid_names"])
    fsreport(ex["fastsummary"], "plasmid,species,genus", ex["odir"], tf,
             gsfile=ex["gsfile"], min_gene_cnt=10, legacy=True)
    base = os.path.join(ex["odir"], os.path.basename(ex["fastsummary"]))
    for rk in ("species", "genus"):
        assert open(base + "." + rk, "rb").read() == _ship(ex, "." + rk), rk


def test_summary_ordered_example(ex):
    from lmat_tpu.reporting.summary import Summary

    s = Summary(ex["ranks"], ex["fastsummary"], ex["plasmids"], legacy=True)
    obase = os.path.join(ex["odir"], "ordered")
    s.run(ex["fastsummary"] + ".summ", obase, "plasmid,species,genus")
    for rk in ("plasmid", "species", "genus"):
        assert (
            open(obase + "." + rk, "rb").read() == _ship(ex, ".ordered." + rk)
        ), rk


@pytest.mark.parametrize("device", [False, True])
def test_content_summ_example(ex, device):
    from lmat_tpu.apps.content_summ import ContentSummarizer, ContentSummOptions
    from lmat_tpu.core.taxonomy import Taxonomy

    tax = Taxonomy.from_lmat_file(ex["taxtree"])
    tax.load_rank_file(ex["ranks"])
    cs = ContentSummarizer(
        tax, ContentSummOptions(k_list=(8, 10, 12, 14, 17), device=device)
    )
    cs.load_fastsummary(ex["fastsummary"])
    for path in ex["out_files"]:
        cs.process_out_file(path)
    base = os.path.join(ex["odir"], "cs.summ")
    cs.write_summ(base)
    assert open(base, "rb").read() == _ship(ex, ".summ")
    ranks = (
        "depth=0", "superkingdom", "kingdom", "subkingdom", "phylum", "order",
        "family", "genus", "species_group", "species", "strain",
    )
    for rk in ranks:
        assert (
            open(f"{base}.{rk}_kmer_cov", "rb").read()
            == _ship(ex, f".summ.{rk}_kmer_cov")
        ), rk
