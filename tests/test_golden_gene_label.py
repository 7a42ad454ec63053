"""gene_label bit-identical vs compiled reference on the fixture gene DB."""

import os

from lmat_tpu.apps.gene_label import GeneLabeler, GeneLabelOptions
from lmat_tpu.apps.make_db import build_from_kpc

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


def test_gene_label_device_probe_bit_identical(tmp_path):
    gidx = build_from_kpc(FIX + "/work/genekmers.0", k=20, max_tids=32)
    gl = GeneLabeler(
        gidx, GeneLabelOptions(min_score=0.1, min_kmer=20, min_tax_score=0.0)
    )
    base = str(tmp_path / "gld")
    gl.run_files([FIX + "/work/rl_nonull0.out"], base, device=True)
    assert open(base + "0.out").read() == open(FIX + "/work/gl_out0.out").read()


def test_gene_label_bit_identical(tmp_path):
    gidx = build_from_kpc(FIX + "/work/genekmers.0", k=20, max_tids=32)
    gl = GeneLabeler(
        gidx, GeneLabelOptions(min_score=0.1, min_kmer=20, min_tax_score=0.0)
    )
    base = str(tmp_path / "gl")
    gl.run_files([FIX + "/work/rl_nonull0.out"], base)
    gl.write_summaries(FIX + "/gene_names.txt.gz", base)
    assert open(base + "0.out").read() == open(FIX + "/work/gl_out0.out").read()
    assert (
        open(base + ".0.1.20.genesummary").read()
        == open(FIX + "/work/gl_out.0.1.20.genesummary").read()
    )
    assert (
        open(base + ".0.1.20.genesummary.min_tax_score.0").read()
        == open(FIX + "/work/gl_out.0.1.20.genesummary.min_tax_score.0").read()
    )
