"""Query-time rank-priority pruning (-g/-m) bit-identical vs reference."""

import os

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


def test_prune_bit_identical():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    rank_map = {
        int(a): int(b) for a, b in (l.split() for l in open(FIX + "/numeric_ranks"))
    }
    opts = ScoreOptions(
        min_score=0.0, min_kmer=30, diff_thresh=1.0, diff_thresh2=0.0,
        prn_all=True, max_count=2, tid_rank_map=rank_map,
    )
    clf = Classifier(tax, idx, opts)
    golden = open(FIX + "/work/rl_prune0.out").read().splitlines()
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        if not hdr:
            hdr = f"unknown_hdr:{i + 1}"
        line = clf.classify(hdr, seq)
        assert line == golden[i], f"read {i} differs"
