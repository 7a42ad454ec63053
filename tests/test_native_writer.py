"""Native .out formatter parity: byte stream and summary tallies must match
the pure-Python formatter exactly."""

import io
import os

import pytest

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_fast import FastClassifier
from lmat_tpu.apps.read_label_score_device import DeviceScorer, DeviceScorerConfig
from lmat_tpu.core.nullmodel import NullModel
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat
from lmat_tpu.io.native_writer import native_available

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_formatter_matches_python(tmp_path):
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    null = NullModel.load(FIX + "/null_lst.txt", lmat_dir=FIX)
    cfg = DeviceScorerConfig(max_candidates=128, min_kmer=30)

    reads = []
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        reads.append((hdr or f"unknown_hdr:{i+1}", seq))
    batches = [reads[i : i + 64] for i in range(0, len(reads), 64)]

    def build():
        scorer = DeviceScorer(tax, cfg, null_model=null)
        dev = scorer.remap_index_tids(idx).to_device()
        return FastClassifier(dev, scorer, k=20)

    py = build()
    py_lines = py.classify_stream(batches)
    py_bytes = "".join(
        l if l.endswith("\t") else l + "\n" for l in py_lines
    ).encode()

    nat = build()
    sink = io.BytesIO()
    n = nat.classify_stream_native(batches, sink, pad_to=256, fixed_rows=64)
    assert n == len(reads)
    assert sink.getvalue() == py_bytes
    assert nat.track_count == py.track_count
    assert nat.track_nomatch == py.track_nomatch
    for t, v in py.track_score.items():
        assert nat.track_score[t] == v  # exact f32 accumulation
