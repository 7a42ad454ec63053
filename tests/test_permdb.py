"""Native SortedDb PERM ``.db`` image import/export (lmat_tpu/io/permdb.py).

The reference persists its index as a raw PERM heap image
(/root/reference/src/kmerdb/SortedDb.hpp:143-385, include/perm.h:133-195).
Round-trip tests (export -> import, both container paths) always run; tests
against oracle-built images need the ~4 GB fixtures from
``tools/oracle/gen_perm_golden.sh`` and skip when absent.
"""

import os

import numpy as np
import pytest

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.io.permdb import (
    load_conv_map,
    load_perm_db,
    open_index,
    save_perm_db,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
PT = "/tmp/permtest"


def _assert_identical(a, b, conv16=False):
    assert a.n_kmers == b.n_kmers
    assert a.k == b.k
    assert (a.suffix == b.suffix).all()
    assert (
        np.asarray(a.bucket_start, np.int64) == np.asarray(b.bucket_start, np.int64)
    ).all()
    assert (
        np.asarray(a.tid_start, np.int64) == np.asarray(b.tid_start, np.int64)
    ).all()
    assert (a.ng == b.ng).all()
    if conv16:
        # a's arena holds 16-bit ids resolved through its conv table
        assert a.conv_table is not None
        assert (a.conv_table[a.tid_flat] == b.tid_flat).all()
    else:
        assert (a.tid_flat == b.tid_flat).all()


@pytest.fixture(scope="module")
def ref_index():
    return build_from_tax_histo(
        [os.path.join(FIX, "work", "taxhisto.bin")], k=20, max_tids=16
    )


def test_roundtrip_shim_and_scan(tmp_path, ref_index):
    p = str(tmp_path / "rt.db")
    save_perm_db(ref_index, p)
    _assert_identical(load_perm_db(p), ref_index)
    # generic path: ignore the shim header, signature-scan + base recovery
    _assert_identical(load_perm_db(p, force_scan=True), ref_index)


def test_roundtrip_k18(tmp_path):
    ref = build_from_tax_histo(
        [os.path.join(FIX, "work", "taxhisto18.bin")], k=18, max_tids=16
    )
    p = str(tmp_path / "rt18.db")
    save_perm_db(ref, p)
    _assert_identical(load_perm_db(p), ref)


def test_open_index_dispatch(tmp_path, ref_index):
    d = str(tmp_path / "bundle")
    ref_index.save(d)
    _assert_identical(open_index(d), ref_index)
    p = str(tmp_path / "img.db")
    save_perm_db(ref_index, p)
    _assert_identical(open_index(p), ref_index)


def test_lookups_match_host(tmp_path, ref_index):
    p = str(tmp_path / "lk.db")
    save_perm_db(ref_index, p)
    imp = load_perm_db(p)
    bs = np.asarray(ref_index.bucket_start, np.int64)
    prefix = np.repeat(np.arange(len(bs) - 1, dtype=np.uint64), np.diff(bs))
    full = (prefix << np.uint64(20)) | ref_index.suffix.astype(np.uint64)
    rng = np.random.default_rng(7)
    for km in rng.choice(full, size=200, replace=False):
        r = ref_index.lookup_host(int(km))
        i = imp.lookup_host(int(km))
        assert r is not None and i is not None
        assert r[0] == i[0] and (r[1] == np.asarray(i[1])).all()
    # absent k-mer
    assert imp.lookup_host(int(full[0]) ^ 1) == ref_index.lookup_host(
        int(full[0]) ^ 1
    )


GZ_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "permdb")


@pytest.fixture(scope="session")
def perm_images(tmp_path_factory):
    """Directory with the oracle-built .db heap images.

    Prefers a live /tmp/permtest (tools/oracle/gen_perm_golden.sh output);
    otherwise decompresses the committed gzipped images (the 4 GB heaps are
    ~19 MB gzipped; all-zero regions are written sparsely) so the oracle
    tests run on a fresh checkout with zero skips."""
    if os.path.exists(os.path.join(PT, "fixture.db")):
        return PT
    import gzip

    d = str(tmp_path_factory.mktemp("permdb"))
    CH = 1 << 20
    for name in ("fixture.db", "fixture18.db", "fixture16.db"):
        src = os.path.join(GZ_DIR, name + ".gz")
        if not os.path.exists(src):
            pytest.skip(f"{name}.gz fixture absent "
                        "(tools/oracle/gen_perm_golden.sh)")
        dst = os.path.join(d, name)
        with gzip.open(src, "rb") as f, open(dst, "wb") as o:
            while True:
                b = f.read(CH)
                if not b:
                    break
                if b.count(0) == len(b):
                    o.seek(len(b), 1)  # keep the heap file sparse
                else:
                    o.write(b)
            o.truncate()
    return d


def test_oracle_image_k20(perm_images, ref_index):
    _assert_identical(
        load_perm_db(os.path.join(perm_images, "fixture.db")), ref_index
    )
    _assert_identical(
        load_perm_db(os.path.join(perm_images, "fixture.db"), force_scan=True),
        ref_index,
    )


def test_oracle_image_k18(perm_images):
    ref = build_from_tax_histo(
        [os.path.join(FIX, "work", "taxhisto18.bin")], k=18, max_tids=16
    )
    _assert_identical(
        load_perm_db(os.path.join(perm_images, "fixture18.db")), ref
    )


def test_oracle_image_16bit(perm_images, ref_index):
    cm = load_conv_map(os.path.join(FIX, "m32to16.map"))
    imp = load_perm_db(
        os.path.join(perm_images, "fixture16.db"), conv_map=cm
    )
    _assert_identical(imp, ref_index, conv16=True)


def test_imported_image_classifies_identically(tmp_path, perm_images, ref_index):
    """End-to-end: exact-mode read_label on the imported native image is
    byte-identical to the oracle golden (rl_nonull)."""
    import argparse

    from lmat_tpu.apps.run_read_label import run as rl_run

    out = str(tmp_path / "rl_imp")
    ns = argparse.Namespace(
        db=os.path.join(perm_images, "fixture.db"),
        reads=os.path.join(FIX, "reads.fa"),
        tax_tree=os.path.join(FIX, "taxtree.dat"),
        depth=os.path.join(FIX, "depth.dat"),
        rank_file=os.path.join(FIX, "ranks.dat"),
        rank_ids=os.path.join(FIX, "taxids.info"),
        null_list=None,
        lmat_dir=FIX,
        output=out,
        min_score=0.0,
        min_kmer=30,
        sdiff=1.0,
        hbias=0.0,
        fastq=False,
        conv_map=None,
    )
    rl_run(ns)
    for got, want in [
        (out + "0.out", "rl_nonull0.out"),
        (out + ".0.30.fastsummary", "rl_nonull.0.30.fastsummary"),
        (out + ".0.30.nomatchsum", "rl_nonull.0.30.nomatchsum"),
    ]:
        with open(got, "rb") as f1, open(
            os.path.join(FIX, "work", want), "rb"
        ) as f2:
            assert f1.read() == f2.read(), got
