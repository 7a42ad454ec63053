"""Permissive match mode (-s) bit-identical vs reference."""

import os

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


def test_permissive_bit_identical():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    clf = Classifier(
        tax, idx,
        ScoreOptions(min_score=0.0, min_kmer=30, diff_thresh=1.0,
                     diff_thresh2=0.0, prn_all=True, permissive=True),
    )
    buf = []
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        if not hdr:
            hdr = f"unknown_hdr:{i + 1}"
        line = clf.classify(hdr, seq)
        buf.append(line if line.endswith("\t") else line + "\n")
    assert "".join(buf) == open(FIX + "/work/rl_perm0.out").read()
