"""Human/adaptor k-mer feed merging at DB build (make_db_table -j/-u)
bit-identical vs reference end-to-end."""

import os

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
CODE = {"a": 0, "c": 1, "g": 2, "t": 3}


def enc(s):
    v = 0
    for ch in s.strip():
        v = (v << 2) | CODE[ch]
    return v


def test_feed_merge_bit_identical():
    human = [enc(l) for l in open(FIX + "/human_kmers.txt")]
    adap = set(enc(l) for l in open(FIX + "/adaptor_kmers.txt"))
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(
        FIX + "/work/taxhisto.bin", k=20, max_tids=9,
        human_kmers=human, adaptor_kmers=adap,
    )
    clf = Classifier(
        tax, idx,
        ScoreOptions(min_score=0.0, min_kmer=30, diff_thresh=1.0,
                     diff_thresh2=0.0, prn_all=True),
    )
    golden = open(FIX + "/work/rl_feed0.out").read().splitlines()
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        if not hdr:
            hdr = f"unknown_hdr:{i + 1}"
        assert clf.classify(hdr, seq) == golden[i], f"read {i} differs"
