"""Bit-identical classification against golden outputs produced by the
compiled reference binaries (tools/oracle) on the synthetic fixture."""

import os

import pytest

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


@pytest.fixture(scope="module")
def setup():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    return tax, idx


def classify_all(clf):
    lines = []
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        if not hdr:
            hdr = f"unknown_hdr:{i + 1}"
        lines.append(clf.classify(hdr, seq))
    return lines


def test_bit_identical_with_null_model(setup, tmp_path):
    from lmat_tpu.core.nullmodel import NullModel

    tax, idx = setup
    null = NullModel.load(FIX + "/null_lst.txt", lmat_dir=FIX)
    opts = ScoreOptions(
        min_score=0.0, min_kmer=30, diff_thresh=1.0, diff_thresh2=0.0, prn_all=True
    )
    clf = Classifier(tax, idx, opts, null_model=null)
    lines = classify_all(clf)
    golden = open(FIX + "/work/rl_null0.out").read().splitlines()
    assert len(lines) == len(golden)
    for i, (mine, ref) in enumerate(zip(lines, golden)):
        assert mine == ref, f"read {i} differs:\nmine: {mine}\nref:  {ref}"
    fs = tmp_path / "fs"
    clf.write_fastsummary(str(fs), FIX + "/taxids.info")
    assert fs.read_text() == open(FIX + "/work/rl_null.0.30.fastsummary").read()
    nm = tmp_path / "nm"
    clf.write_nomatchsum(str(nm))
    assert nm.read_text() == open(FIX + "/work/rl_null.0.30.nomatchsum").read()


def test_bit_identical_no_null(setup, tmp_path):
    tax, idx = setup
    opts = ScoreOptions(
        min_score=0.0, min_kmer=30, diff_thresh=1.0, diff_thresh2=0.0, prn_all=True
    )
    clf = Classifier(tax, idx, opts)
    lines = classify_all(clf)
    golden = open(FIX + "/work/rl_nonull0.out").read().splitlines()
    assert len(lines) == len(golden)
    for i, (mine, ref) in enumerate(zip(lines, golden)):
        assert mine == ref, f"read {i} differs:\nmine: {mine}\nref:  {ref}"

    fs = tmp_path / "fs"
    clf.write_fastsummary(str(fs), FIX + "/taxids.info")
    assert fs.read_text() == open(FIX + "/work/rl_nonull.0.30.fastsummary").read()
    nm = tmp_path / "nm"
    clf.write_nomatchsum(str(nm))
    assert nm.read_text() == open(FIX + "/work/rl_nonull.0.30.nomatchsum").read()


def test_bit_identical_k18(tmp_path):
    """18-mer geometry (production marker-DB k) against an IDX_CONFIG=1827
    oracle build; the index layouts differ, the outputs must not."""
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto18.bin", k=18, max_tids=8)
    opts = ScoreOptions(
        min_score=0.0, min_kmer=30, diff_thresh=1.0, diff_thresh2=0.0, prn_all=True
    )
    clf = Classifier(tax, idx, opts)
    lines = classify_all(clf)
    golden = open(FIX + "/work/rl_k180.out").read().splitlines()
    assert len(lines) == len(golden)
    for i, (mine, ref) in enumerate(zip(lines, golden)):
        assert mine == ref, f"read {i} differs:\nmine: {mine}\nref:  {ref}"
    fs = tmp_path / "fs"
    clf.write_fastsummary(str(fs), FIX + "/taxids.info")
    assert fs.read_text() == open(FIX + "/work/rl_k18.0.30.fastsummary").read()


def test_fast_mode_k18_calls(tmp_path):
    """Device fast mode at k=18: call-level identical to the oracle."""
    from lmat_tpu.apps.read_label_fast import FastClassifier
    from lmat_tpu.apps.read_label_score_device import (
        DeviceScorer, DeviceScorerConfig)

    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto18.bin", k=18, max_tids=8)
    scorer = DeviceScorer(tax, DeviceScorerConfig(max_candidates=128, min_kmer=30))
    fast = FastClassifier(scorer.remap_index_tids(idx).to_device(), scorer, k=18)
    reads = []
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        reads.append((hdr or f"unknown_hdr:{i+1}", seq))
    lines = fast.classify_stream([reads[i : i + 100] for i in range(0, 400, 100)])
    golden = open(FIX + "/work/rl_k180.out").read().splitlines()
    for mine, ref in zip(lines, golden):
        assert mine.split("\t")[-1].split()[0::2] == ref.split("\t")[-1].split()[0::2]
