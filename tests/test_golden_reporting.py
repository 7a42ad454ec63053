"""Reporting layer (fsreport/tolineage/summary) bit-identical vs the
reference's own scripts run on the fixture."""

import os

from lmat_tpu.reporting.fsreport import TaxFiles, fsreport
from lmat_tpu.reporting.summary import Summary
from lmat_tpu.reporting.tolineage import tolineage

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
W = FIX + "/work"


def _taxfiles():
    return TaxFiles(
        FIX + "/taxtree.dat",
        FIX + "/ranks.dat",
        FIX + "/low_numid_plasmids.txt",
        FIX + "/plasmid.names.txt",
    )


def test_tolineage(tmp_path):
    out = tmp_path / "lineage"
    tolineage(FIX + "/taxids.info", W + "/rl_nonull.0.30.fastsummary", str(out), 10, 0.0)
    assert out.read_text() == open(W + "/rl_nonull.lineage").read()


def test_fsreport(tmp_path):
    fsreport(W + "/rl_nonull.0.30.fastsummary", "plasmid,species,genus", str(tmp_path), _taxfiles())
    for r in ("plasmid", "species", "genus"):
        name = f"rl_nonull.0.30.fastsummary.{r}"
        assert (tmp_path / name).read_text() == open(f"{W}/fsreport/{name}").read()


def test_fsreport_with_genes(tmp_path):
    fsreport(
        W + "/rl_nonull.0.30.fastsummary", "plasmid,species,genus", str(tmp_path),
        _taxfiles(), gsfile=W + "/gl_sorted.genesummary", min_gene_cnt=10,
    )
    for r in ("plasmid", "species", "genus"):
        name = f"rl_nonull.0.30.fastsummary.{r}"
        assert (tmp_path / name).read_text() == open(f"{W}/fsreport_genes/{name}").read()


def test_summary(tmp_path):
    s = Summary(FIX + "/ranks.dat", W + "/rl_nonull.0.30.fastsummary", FIX + "/low_numid_plasmids.txt")
    s.run(W + "/cs_out.summ", str(tmp_path / "ordered"), "plasmid,species,genus")
    for r in ("plasmid", "species", "genus"):
        assert (tmp_path / f"ordered.{r}").read_text() == open(f"{W}/cs_ordered.{r}").read()
