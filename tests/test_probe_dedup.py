"""Cross-read dedup probe: probing each distinct k-mer once must give
results identical to probing every window, and undersized caps must degrade
through the per-read overflow fallback, never corrupt."""

import os

import numpy as np

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_device import pad_batch, prepare_reads, probe, probe_dedup
from lmat_tpu.apps.read_label_fast import FastClassifier
from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
from lmat_tpu.apps.read_label_score_device import DeviceScorer, DeviceScorerConfig
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
K = 20


def _setup():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=K, max_tids=8)
    reads = [
        (h or f"r{i}", s) for i, (h, s) in enumerate(iter_reads_lmat(FIX + "/reads.fa"))
    ][:64]
    return tax, idx, reads


def test_probe_dedup_matches_probe():
    tax, idx, reads = _setup()
    scorer = DeviceScorer(tax, DeviceScorerConfig(max_candidates=64, min_kmer=30))
    dev = scorer.remap_index_tids(idx).to_device()
    batch = pad_batch([s for _, s in reads], pad_to=256)
    prep = prepare_reads(batch, K)
    ref = probe(dev, prep)
    B, P = np.asarray(ref["found"]).shape
    got = probe_dedup(dev, prep, u_cap=B * P)  # full cap: no overflow possible
    assert int(np.max(np.asarray(got["dedup_ovf"]))) == 0
    for key in ("found", "ng", "tids", "tmask"):
        a, b = np.asarray(ref[key]), np.asarray(got[key])
        assert (a == b).all(), key
    # duplication exists in the fixture (reads share organisms)
    n_u = int(np.asarray(got["n_unique"]))
    n_q = int(np.asarray(prep["qvalid"]).sum())
    assert 0 < n_u <= n_q


def test_dedup_classifier_lines_identical():
    tax, idx, reads = _setup()
    cfg = DeviceScorerConfig(max_candidates=64, min_kmer=30)

    scorer1 = DeviceScorer(tax, cfg)
    dev1 = scorer1.remap_index_tids(idx).to_device()
    plain = FastClassifier(dev1, scorer1, k=K)
    want = plain._format(reads, plain.step(plain.pad(reads, pad_to=256)))

    scorer2 = DeviceScorer(tax, cfg)
    dev2 = scorer2.remap_index_tids(idx).to_device()
    fast = FastClassifier(dev2, scorer2, k=K, dedup_frac=1.0)
    got = fast._format(reads, fast.step(fast.pad(reads, pad_to=256)))
    assert got == want
    assert fast.track_count == plain.track_count


def test_dedup_undersized_cap_falls_back():
    tax, idx, reads = _setup()
    cfg = DeviceScorerConfig(max_candidates=64, min_kmer=30)
    scorer = DeviceScorer(tax, cfg)
    dev = scorer.remap_index_tids(idx).to_device()
    # tiny cap: most distinct k-mers overflow -> exact-path fallback
    fast = FastClassifier(dev, scorer, k=K, dedup_frac=0.01)
    opts = ScoreOptions(min_kmer=30, prn_all=True)
    fast.set_fallback(Classifier(tax, idx, opts))
    import jax

    dev_out = fast.step(fast.pad(reads, pad_to=256))
    ovf = np.asarray(jax.device_get(dev_out)[4])
    assert ovf.max() > 0, "cap must overflow for this test to bite"
    lines = fast._format(reads, dev_out)

    exact = Classifier(tax, idx, opts)
    for i, (h, s) in enumerate(reads):
        want = exact.classify(h, s)
        if ovf[i] > 0:
            assert lines[i] == want
