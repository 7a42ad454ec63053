"""Fast mode (full device scorer) vs exact host mode: call-level agreement on
all fixture reads (call taxid, match type, score within fp tolerance)."""

import os
import re

import numpy as np
import pytest

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_fast import FastClassifier
from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
from lmat_tpu.apps.read_label_score_device import DeviceScorer, DeviceScorerConfig
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


def call_fields(line):
    """(call_tid, score, match) from an output line ('' if malformed)."""
    parts = line.split("\t")
    if len(parts) < 5 or not parts[4]:
        return None
    toks = parts[4].split()
    return toks[-3], float(toks[-2]), toks[-1]


@pytest.fixture(scope="module")
def env():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    reads = []
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        reads.append((hdr or f"unknown_hdr:{i + 1}", seq))
    return tax, idx, reads


def test_fast_matches_exact(env):
    tax, idx, reads = env
    opts = ScoreOptions(
        min_score=0.0, min_kmer=30, diff_thresh=1.0, diff_thresh2=0.0, prn_all=True
    )
    exact = Classifier(tax, idx, opts)
    exact_lines = [exact.classify(h, s) for h, s in reads]

    cfg = DeviceScorerConfig(max_candidates=32, min_kmer=30, diff_thresh=1.0, diff_thresh2=0.0)
    scorer = DeviceScorer(tax, cfg)
    remapped = scorer.remap_index_tids(idx)
    fast = FastClassifier(remapped.to_device(), scorer, k=20)
    fast_lines = fast.classify_batch(reads)

    agree = 0
    diffs = []
    for i, (el, fl) in enumerate(zip(exact_lines, fast_lines)):
        e = call_fields(el)
        f = call_fields(fl)
        if e is None and f is None:
            agree += 1
            continue
        if e is None or f is None:
            diffs.append((i, el.split("\t")[2:], fl.split("\t")[2:]))
            continue
        if e[0] == f[0] and e[2] == f[2] and abs(e[1] - f[1]) < 2e-3:
            agree += 1
        else:
            diffs.append((i, e, f))
    assert not diffs, f"{len(diffs)} call differences, first: {diffs[:3]}"
    assert agree == len(reads)

    # summary tallies agree
    assert fast.track_count == exact.track_count
    assert fast.track_nomatch == exact.track_nomatch


def test_fast_permissive_matches_exact():
    """Permissive (-s) fast mode: call-level identical to the permissive
    host classifier on the fixture."""
    import os

    import numpy as np

    from lmat_tpu.apps.make_db import build_from_tax_histo
    from lmat_tpu.apps.read_label_fast import FastClassifier
    from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
    from lmat_tpu.apps.read_label_score_device import (
        DeviceScorer, DeviceScorerConfig)
    from lmat_tpu.core.taxonomy import Taxonomy
    from lmat_tpu.io.fasta import iter_reads_lmat

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)

    host = Classifier(tax, idx, ScoreOptions(
        min_score=0.0, min_kmer=30, prn_all=True, permissive=True))
    sc = DeviceScorer(tax, DeviceScorerConfig(
        max_candidates=128, min_kmer=30, permissive=True))
    fast = FastClassifier(sc.remap_index_tids(idx).to_device(), sc, k=20)

    reads = []
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        reads.append((hdr or f"unknown_hdr:{i+1}", seq))
    fast_lines = fast.classify_stream([reads[i : i + 100] for i in range(0, 400, 100)])
    for i, (hdr, seq) in enumerate(reads):
        exact = host.classify(hdr, seq)
        f_call = fast_lines[i].split("\t")[-1].split()
        e_call = exact.split("\t")[-1].split()
        assert f_call[0::2] == e_call[0::2], f"read {i}: {f_call} vs {e_call}"
        # candidate SETS identical too (scores may differ in ulps)
        f_set = set(fast_lines[i].split("\t")[3].split()[0::2])
        e_set = set(exact.split("\t")[3].split()[0::2])
        assert f_set == e_set, f"read {i}"
