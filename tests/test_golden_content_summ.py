"""content_summ bit-identical vs compiled reference."""

import os

from lmat_tpu.apps.content_summ import ContentSummarizer, ContentSummOptions
from lmat_tpu.core.taxonomy import Taxonomy

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


def test_content_summ_bit_identical(tmp_path):
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    cs = ContentSummarizer(tax, ContentSummOptions(k_list=(8, 10, 12, 14, 17)))
    cs.load_fastsummary(FIX + "/work/rl_nonull.0.30.fastsummary")
    cs.process_out_file(FIX + "/work/rl_nonull0.out")
    base = str(tmp_path / "cs.summ")
    cs.write_summ(base)
    assert open(base).read() == open(FIX + "/work/cs_out.summ").read()
    for s in ("genus", "species", "strain"):
        assert (
            open(f"{base}.{s}_kmer_cov").read()
            == open(f"{FIX}/work/cs_out.summ.{s}_kmer_cov").read()
        )
