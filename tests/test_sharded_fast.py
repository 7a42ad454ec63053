"""Multi-chip fast mode: the mesh-sharded probe + scorer must produce the
same outputs (lines and summaries) as the single-chip fast path."""

import os

import pytest

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_fast import FastClassifier
from lmat_tpu.apps.read_label_score_device import DeviceScorer, DeviceScorerConfig
from lmat_tpu.apps.read_label_sharded import make_sharded_classifier
from lmat_tpu.core.nullmodel import NullModel
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat
from lmat_tpu.parallel.mesh import make_mesh

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


@pytest.mark.parametrize("data,db", [(2, 4), (1, 8)])
def test_sharded_fast_matches_single(data, db, tmp_path):
    import jax

    if len(jax.devices()) < data * db:
        pytest.skip("needs 8 virtual devices")
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    null = NullModel.load(FIX + "/null_lst.txt", lmat_dir=FIX)
    cfg = DeviceScorerConfig(max_candidates=64, min_kmer=30)

    reads = []
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        reads.append((hdr or f"unknown_hdr:{i+1}", seq))
    reads = reads[:128]
    batches = [reads[i : i + 64] for i in range(0, len(reads), 64)]

    scorer1 = DeviceScorer(tax, cfg, null_model=null)
    dev = scorer1.remap_index_tids(idx).to_device()
    single = FastClassifier(dev, scorer1, k=20)
    # the single path must pad to the same read_len for identical shapes
    lines1 = []
    for b in batches:
        lines1.extend(single._format(b, single.step(single.pad(b, pad_to=256, fixed_rows=64))))

    mesh = make_mesh(data=data, db=db)
    _, sharded = make_sharded_classifier(
        mesh, idx, tax, cfg, null_model=null, k=20, batch=64, read_len=256
    )
    lines2 = []
    for b in batches:
        lines2.extend(sharded._format(b, sharded.step(sharded.pad(b))))

    assert lines1 == lines2
    assert sharded.track_count == single.track_count
    assert sharded.track_nomatch == single.track_nomatch
