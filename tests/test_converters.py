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
