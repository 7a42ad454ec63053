import json
import os

from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.reporting.biom import fastsummary_to_biom
from lmat_tpu.reporting.html_report import report_html

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
W = FIX + "/work"


def test_biom_export(tmp_path):
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    out = tmp_path / "t.biom"
    fastsummary_to_biom(
        [("s1", W + "/rl_nonull.0.30.fastsummary"),
         ("s2", W + "/rl_null.0.30.fastsummary")],
        str(out), taxonomy=tax,
    )
    b = json.loads(out.read_text())
    assert b["format"].startswith("Biological Observation Matrix")
    assert b["shape"][1] == 2
    assert b["shape"][0] > 5
    total = sum(d[2] for d in b["data"])
    golden = sum(int(l.split("\t")[1]) for l in open(W + "/rl_nonull.0.30.fastsummary"))
    golden += sum(int(l.split("\t")[1]) for l in open(W + "/rl_null.0.30.fastsummary"))
    assert total == golden
    row32630 = [r for r in b["rows"] if r["id"] == "32630"][0]
    assert "synthetic construct phiX" in row32630["metadata"]["taxonomy"]


def test_html_report(tmp_path):
    out = tmp_path / "r.html"
    report_html(
        W + "/fsreport/rl_nonull.0.30.fastsummary.species",
        W + "/fsreport/rl_nonull.0.30.fastsummary.genus",
        str(out),
    )
    doc = out.read_text()
    assert "<table>" in doc and "Species-level" in doc and "SpeciesB1" in doc


def test_phyloseq_tables(tmp_path):
    """BIOM/phyloseq conversion (Supplementary_Tools/BIOM): otu_reads /
    otu_ra / tax_table matrices from per-sample .species reports, the
    format phyloseq's otu_table/tax_table importers consume."""
    import os

    from lmat_tpu.reporting.phyloseq import phyloseq_tables

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
    sp = os.path.join(FIX, "work", "fsreport",
                      "rl_nonull.0.30.fastsummary.species")
    otu, ra, taxt = phyloseq_tables(
        [("s1", sp), ("s2", sp)], str(tmp_path / "ps")
    )
    rows = [l.split("\t") for l in open(otu).read().splitlines()]
    assert rows[0] == ["TAXID", "s1", "s2"]
    assert len(rows) > 1
    for r in rows[1:]:
        assert int(r[0]) > 0
        assert r[1] == r[2] and int(r[1]) > 0  # same file -> same counts
    rar = [l.split("\t") for l in open(ra).read().splitlines()]
    for col in (1, 2):
        s = sum(float(r[col]) for r in rar[1:])
        assert abs(s - 1.0) < 1e-9  # relative abundance sums to 1
    tt = [l.split("\t") for l in open(taxt).read().splitlines()]
    assert tt[0] == ["TAXID", "genus", "specie"]
    assert [r[0] for r in tt[1:]] == [r[0] for r in rows[1:]]

    # with a taxonomy: full-lineage rank columns (the Tax_Ref join)
    from lmat_tpu.core.taxonomy import Taxonomy

    tax = Taxonomy.from_lmat_file(os.path.join(FIX, "taxtree.dat"))
    tax.load_rank_file(os.path.join(FIX, "ranks.dat"))
    _, _, taxt2 = phyloseq_tables(
        [("s1", sp)], str(tmp_path / "ps2"), taxonomy=tax
    )
    tt2 = [l.split("\t") for l in open(taxt2).read().splitlines()]
    assert tt2[0][0] == "TAXID" and "Species" in tt2[0]
    assert len(tt2) == len(rows)
