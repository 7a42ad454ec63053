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


def test_genesummary_regen(ex):
    """Regenerate both gene summaries from the shipped gl_output .out files.

    The gene annotation table is reconstructed from the summaries themselves
    (each row carries its annotation line; the unfiltered summary was sorted
    by run_gl.sh so its order is annotation-independent after we re-sort the
    same way, and the min_tax_score file preserves annotation order for its
    subset).  Run: gene_label -x 0.1 -q 20 -b 0 (run_gl.sh + shipped names).
    """
    from lmat_tpu.apps.gene_label import GeneLabeler, GeneLabelOptions

    exdir = ex["exdir"]
    gl_base = os.path.join(exdir, example_replay.GL_BASE)
    ship_sorted = gl_base + ".0.1.20.genesummary"
    ship_tax = ship_sorted + ".min_tax_score.0"

    def annot(path):
        seen, order = set(), []
        for ln in open(path):
            a = ln.rstrip("\n").split("\t", 3)[3]
            if a not in seen:
                seen.add(a)
                order.append(a)
        return order

    gene_table = list(annot(ship_tax))
    extra = [a for a in annot(ship_sorted) if a not in set(gene_table)]
    table_path = os.path.join(ex["odir"], "gene_table.txt")
    with open(table_path, "w") as f:
        for a in gene_table + extra:
            f.write(a + "\n")

    lab = GeneLabeler(None, GeneLabelOptions(min_score=0.1, min_kmer=20,
                                             min_tax_score=0.0))
    for i in range(8):
        lab.ingest_out_file(f"{gl_base}{i}.out")
    obase = os.path.join(ex["odir"], "gl_regen")
    lab.write_summaries(table_path, obase)

    import math

    def rows(path):
        return [l.split("\t", 1) for l in open(path).read().splitlines()]

    def assert_rows_match(got, want):
        """Columns 2+ byte-exact per row; column 1 (a float32 average of
        scores re-parsed from 6-digit text) to the last printed digit +-1."""
        assert len(got) == len(want)
        gd = {rest: col1 for col1, rest in got}
        for col1, rest in want:
            assert rest in gd, rest
            fw = float(col1)
            q = 10.0 ** (math.floor(math.log10(abs(fw))) - 5) if fw else 1e-6
            assert abs(float(gd[rest]) - fw) <= 1.01 * q, (gd[rest], col1)

    got_tax = rows(obase + ".0.1.20.genesummary.min_tax_score.0")
    want_tax = rows(ship_tax)
    assert_rows_match(got_tax, want_tax)
    # row ORDER must match exactly (annotation-table iteration + sorted labels)
    assert [r for _, r in got_tax] == [r for _, r in want_tax]

    # the unfiltered summary was piped through `sort -k1gr,1gr` (run_gl.sh):
    # descending general-numeric col 1, last-resort whole-line byte order.
    # Validate the sort emulation on the shipped bytes themselves, then the
    # regenerated content with the same column-1 tolerance.
    def gnusort(lines):
        return sorted(lines, key=lambda l: (-float(l.split("\t", 1)[0]), l))

    ship_lines = open(ship_sorted).read().splitlines(True)
    assert gnusort(ship_lines) == ship_lines
    assert_rows_match(rows(obase + ".0.1.20.genesummary"), rows(ship_sorted))
