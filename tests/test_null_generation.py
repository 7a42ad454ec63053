"""Null-model generation pipeline: rand read scoring + merge_cnts + loader
round trip; frequency counter vs oracle tax_histo."""

import os

import numpy as np
import pytest

from lmat_tpu.apps.frequency_counter import count_index, count_tax_histo, write_kcnt
from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.null_model_gen import merge_cnts, write_null_lst
from lmat_tpu.apps.rand_read_label import RandReadLabeler, gen_rand_read
from lmat_tpu.core.nullmodel import NullModel
from lmat_tpu.core.taxonomy import Taxonomy

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


@pytest.fixture(scope="module")
def env():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    return tax, idx


def test_gen_rand_read_gc():
    rng = np.random.default_rng(1)
    r = gen_rand_read(rng, 100, 40, 49)
    assert len(r) == 100
    gc = sum(1 for c in r if c in "gc")
    assert 40 <= gc <= 49
    assert set(r) <= set("acgt")


def test_frequency_counter(env):
    tax, idx = env
    c1 = count_tax_histo(FIX + "/work/taxhisto.bin")
    c2 = count_index(idx)
    assert c1 == c2
    assert sum(c1.values()) == int(idx.tid_flat.shape[0])


def test_null_pipeline_roundtrip(env, tmp_path):
    tax, idx = env
    rrl = RandReadLabeler(tax, idx)
    rrl.run(num_reads=200, read_len=100, seed=3)
    rand_lst = tmp_path / "m.rand_lst"
    rrl.write_rand_lst(str(rand_lst))
    # random reads occasionally hit the db; file may be sparse but parseable
    kcnt = count_index(idx)
    out = tmp_path / "null.bin.10.fixture.100.rand_lst"
    merge_cnts(str(rand_lst), tax, FIX + "/ranks.dat", 1, kcnt, str(out), 10)
    lst = write_null_lst(str(tmp_path), [(100, out.name)], k=20)
    nm = NullModel.load(lst, lmat_dir=str(tmp_path))
    assert 81 in nm.rand_hits
    hits = nm.rand_hits[81]
    assert len(hits) > 0
    for tid, cutoff in hits.items():
        assert len(cutoff) == 10
        assert all(0 < float(c) <= 1.0001 for c in cutoff)


def test_device_rand_matches_host(env, tmp_path):
    """The batched device presence pipeline produces the identical .rand_lst
    as the host rkmer loop (same seeded reads)."""
    tax, idx = env
    host = RandReadLabeler(tax, idx)
    host.run(num_reads=300, read_len=100, seed=11)
    f_host = tmp_path / "host.rand_lst"
    host.write_rand_lst(str(f_host))

    dev = RandReadLabeler(tax, idx, device=True, batch=64, max_candidates=64)
    dev.run(num_reads=300, read_len=100, seed=11)
    f_dev = tmp_path / "dev.rand_lst"
    dev.write_rand_lst(str(f_dev))

    assert f_dev.read_text() == f_host.read_text()
