"""16-bit arena compaction: classification through the compacted index is
identical to the 32-bit index (the oracle's 16-bit pipeline also reproduces
its 32-bit output byte-for-byte, so the golden already covers content)."""

import os

import numpy as np

from lmat_tpu.apps.make_db import build_from_tax_histo, compact_16bit
from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


def test_compact16_round_trip():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    mapping = {
        int(a): int(b) for a, b in (l.split() for l in open(FIX + "/m32to16.map"))
    }
    idx16 = compact_16bit(idx, mapping)
    assert idx16.tid_flat.dtype == np.uint16
    # host lookups identical
    for km, _ in zip(
        (int(b) << 20 | int(s) for b, s in
         [(np.nonzero(np.diff(idx.bucket_start))[0][0], idx.suffix[0])]),
        range(1),
    ):
        a = idx.lookup_host(km)
        b = idx16.lookup_host(km)
        assert a[0] == b[0] and np.array_equal(a[1], b[1])
    # end-to-end identical vs golden
    clf = Classifier(
        tax, idx16,
        ScoreOptions(min_score=0.0, min_kmer=30, diff_thresh=1.0,
                     diff_thresh2=0.0, prn_all=True),
    )
    golden = open(FIX + "/work/rl_nonull0.out").read().splitlines()
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        if i >= 100:
            break
        if not hdr:
            hdr = f"unknown_hdr:{i + 1}"
        assert clf.classify(hdr, seq) == golden[i]

    # device path with conversion table
    import jax

    dev = idx16.to_device()
    from lmat_tpu.core.encoding import split64

    some = [int(b) << 20 | int(s) for b, s in
            zip((idx.bucket_start[:-1] != idx.bucket_start[1:]).nonzero()[0][:50],
                idx.suffix[idx.bucket_start[(idx.bucket_start[:-1] != idx.bucket_start[1:]).nonzero()[0][:50]]])]
    hi, lo = split64(np.array(some, np.uint64))
    found, ng, tids, tmask = dev.lookup(hi.reshape(1, -1), lo.reshape(1, -1),
                                        np.ones((1, len(some)), bool))
    found = np.asarray(found)[0]
    tids = np.asarray(tids)[0]
    tmask = np.asarray(tmask)[0]
    for j, km in enumerate(some):
        host = idx.lookup_host(km)
        assert found[j]
        assert np.array_equal(tids[j][tmask[j]], host[1])


def test_fast_mode_16bit_matches_32bit():
    """Full fast-mode classification over a 16-bit compacted index must
    equal the 32-bit original (the remap resolves the conversion table
    before upload)."""
    import os

    from lmat_tpu.apps.make_db import build_from_tax_histo, compact_16bit
    from lmat_tpu.apps.read_label_fast import FastClassifier
    from lmat_tpu.apps.read_label_score_device import (
        DeviceScorer, DeviceScorerConfig)
    from lmat_tpu.core.taxonomy import Taxonomy
    from lmat_tpu.io.fasta import iter_reads_lmat

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx32 = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    conv = {int(t): i + 1 for i, t in enumerate(sorted(tax.parent))}
    idx16 = compact_16bit(
        build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8), conv
    )
    assert idx16.conv_table is not None

    reads = []
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        reads.append((hdr or f"u{i}", seq))
    reads = reads[:128]

    def classify(idx):
        sc = DeviceScorer(tax, DeviceScorerConfig(max_candidates=128, min_kmer=30))
        fc = FastClassifier(sc.remap_index_tids(idx).to_device(), sc, k=20)
        return fc.classify_stream([reads[i : i + 64] for i in range(0, 128, 64)])

    assert classify(idx16) == classify(idx32)
