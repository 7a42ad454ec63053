import numpy as np

from lmat_tpu.core.encoding import split64
from lmat_tpu.core.index import KmerIndex


def random_db(rng, n, k, max_tids):
    kmers = rng.choice(np.arange(0, 1 << (2 * k), dtype=np.uint64), size=n, replace=False)
    lists = [
        np.sort(rng.choice(10000, size=rng.integers(1, max_tids + 1), replace=False)).astype(np.uint32)
        for _ in range(n)
    ]
    return kmers, lists


def test_host_lookup_roundtrip():
    rng = np.random.default_rng(2)
    k = 12
    kmers, lists = random_db(rng, 500, k, 8)
    idx = KmerIndex.build(kmers, lists, k, max_tids=8)
    order = np.argsort(kmers)
    for i in np.concatenate([order[:50], order[-50:]]):
        got = idx.lookup_host(int(kmers[i]))
        assert got is not None
        ng, tids = got
        assert ng == len(lists[i])
        assert np.array_equal(tids, lists[i])
    # misses
    present = set(kmers.tolist())
    for _ in range(100):
        q = int(rng.integers(0, 1 << (2 * k)))
        if q not in present:
            assert idx.lookup_host(q) is None


def test_device_lookup_matches_host():
    rng = np.random.default_rng(3)
    k = 12
    kmers, lists = random_db(rng, 300, k, 8)
    idx = KmerIndex.build(kmers, lists, k, max_tids=8)
    dev = idx.to_device()

    queries = np.concatenate(
        [kmers[:100], rng.integers(0, 1 << (2 * k), size=100).astype(np.uint64)]
    )
    hi, lo = split64(queries)
    found, ng, tids, tmask = dev.lookup(
        np.asarray(hi).reshape(1, -1), np.asarray(lo).reshape(1, -1), np.ones((1, len(queries)), bool)
    )
    found = np.asarray(found)[0]
    ng = np.asarray(ng)[0]
    tids = np.asarray(tids)[0]
    tmask = np.asarray(tmask)[0]
    for j, q in enumerate(queries):
        host = idx.lookup_host(int(q))
        if host is None:
            assert not found[j]
        else:
            hng, htids = host
            assert found[j]
            assert ng[j] == hng
            assert np.array_equal(tids[j][tmask[j]], htids)


def test_save_load(tmp_path):
    rng = np.random.default_rng(4)
    kmers, lists = random_db(rng, 100, 11, 4)
    idx = KmerIndex.build(kmers, lists, 11, max_tids=4)
    idx.save(str(tmp_path / "db"))
    idx2 = KmerIndex.load(str(tmp_path / "db"))
    for q in kmers[:20]:
        a, b = idx.lookup_host(int(q)), idx2.lookup_host(int(q))
        assert a[0] == b[0] and np.array_equal(a[1], b[1])


def _check_device_vs_host(idx, kmers, rng, k, dense):
    from lmat_tpu.core.encoding import split64 as _split

    dev = idx.to_device(dense_lists=dense)
    queries = np.concatenate(
        [kmers, rng.integers(0, 1 << (2 * k), size=200).astype(np.uint64)]
    )
    hi, lo = _split(queries)
    found, ng, tids, tmask = dev.lookup(
        np.asarray(hi).reshape(1, -1), np.asarray(lo).reshape(1, -1),
        np.ones((1, len(queries)), bool),
    )
    found = np.asarray(found)[0]
    ng = np.asarray(ng)[0]
    tids = np.asarray(tids)[0]
    tmask = np.asarray(tmask)[0]
    for j, q in enumerate(queries):
        host = idx.lookup_host(int(q))
        if host is None:
            assert not found[j], hex(int(q))
        else:
            hng, htids = host
            assert found[j]
            assert ng[j] == hng
            assert np.array_equal(tids[j][tmask[j]], htids)


def test_device_lookup_windowed_arena():
    """The big-DB (non-dense) arena path: rows assembled from two aligned
    window gathers."""
    rng = np.random.default_rng(5)
    k = 12
    kmers, lists = random_db(rng, 400, k, 8)
    idx = KmerIndex.build(kmers, lists, k, max_tids=8)
    _check_device_vs_host(idx, kmers, rng, k, dense=False)


def test_device_lookup_deep_buckets():
    """Buckets larger than the suffix window force binary-search steps whose
    element reads map into the overlapping-row layout."""
    rng = np.random.default_rng(6)
    k = 12
    # cram ~1500 k-mers into ONE prefix bucket (same high bits)
    prefix = np.uint64(3 << (2 * k - 4 - 20 + 20)) if False else np.uint64(0)
    lows = rng.choice(np.arange(0, 1 << 16, dtype=np.uint64), size=1500, replace=False)
    kmers = (np.uint64(0xA) << np.uint64(20)) | lows  # bucket 0xA, 1500 suffixes
    lists = [np.sort(rng.choice(10000, size=rng.integers(1, 9), replace=False)).astype(np.uint32)
             for _ in range(len(kmers))]
    idx = KmerIndex.build(kmers, lists, k, max_tids=8)
    assert idx.search_depth > 5  # must exercise the bsearch prefix steps
    for dense in (True, False):
        _check_device_vs_host(idx, kmers, rng, k, dense=dense)


def test_device_lookup_fused_layout():
    """The fused single-gather layout must match the host oracle and the
    windowed layout exactly, hits and misses alike."""
    rng = np.random.default_rng(7)
    k = 12
    kmers, lists = random_db(rng, 400, k, 8)
    idx = KmerIndex.build(kmers, lists, k, max_tids=8)
    dev = idx.to_device(layout="fused")
    assert dev.fused_rows is not None
    queries = np.concatenate(
        [kmers, rng.integers(0, 1 << (2 * k), size=200).astype(np.uint64)]
    )
    hi, lo = split64(queries)
    args = (np.asarray(hi).reshape(1, -1), np.asarray(lo).reshape(1, -1),
            np.ones((1, len(queries)), bool))
    f1, n1, t1, m1 = (np.asarray(x) for x in dev.lookup(*args))
    devw = idx.to_device(layout="window")
    f2, n2, t2, m2 = (np.asarray(x) for x in devw.lookup(*args))
    assert np.array_equal(f1, f2)
    assert np.array_equal(n1, n2)
    assert np.array_equal(t1, t2)
    assert np.array_equal(m1, m2)
    for j, q in enumerate(queries):
        host = idx.lookup_host(int(q))
        if host is None:
            assert not f1[0, j]
        else:
            assert f1[0, j] and n1[0, j] == host[0]
            assert np.array_equal(t1[0, j][m1[0, j]], host[1])


def test_fused_layout_respects_validity_and_auto_policy():
    rng = np.random.default_rng(8)
    k = 12
    kmers, lists = random_db(rng, 64, k, 4)
    idx = KmerIndex.build(kmers, lists, k, max_tids=4)
    # auto picks fused for tiny DBs (controlled step A/B: fused 16.5 ms vs
    # paged 18.4 ms per batch at bench scale; paged takes over at capacity)
    dev = idx.to_device()
    assert dev.fused_rows is not None
    hi, lo = split64(kmers[:32])
    valid = np.zeros((1, 32), bool)
    valid[0, ::2] = True
    f, n, t, m = (np.asarray(x) for x in dev.lookup(
        np.asarray(hi).reshape(1, -1), np.asarray(lo).reshape(1, -1), valid))
    assert not f[0, 1::2].any()
    assert f[0, ::2].all()
    # deep buckets no longer force a layout downgrade: the fused layout
    # borrows fine-bucket bits (e > 0) to keep R at 8 (round 4), and the
    # probe stays exact; windowed remains reachable explicitly
    lows = rng.choice(np.arange(0, 1 << 16, dtype=np.uint64), size=300, replace=False)
    deep = (np.uint64(0xA) << np.uint64(20)) | lows
    lists2 = [np.array([5], np.uint32)] * len(deep)
    idx2 = KmerIndex.build(deep, lists2, k, max_tids=4)
    dev2 = idx2.to_device()
    assert dev2.fused_rows is not None and dev2.fused_e > 0
    hi2, lo2 = split64(deep[:64])
    f2, n2_, t2_, m2_ = (np.asarray(x) for x in dev2.lookup(
        np.asarray(hi2), np.asarray(lo2), np.ones(64, bool)))
    assert f2.all() and (n2_ == 1).all()
    devw = idx2.to_device(layout="window")
    assert devw.bucket_tab is not None
    # explicit fused also succeeds now (the fine split handles the depth)
    devf = idx2.to_device(layout="fused")
    assert devf.fused_rows is not None


def test_empty_tid_lists_and_layout_validation():
    # every k-mer stores an EMPTY taxid list: both packers must not index
    # the empty arena (round-3 advisor finding)
    k = 12
    kmers = np.array([3, 77, 1 << 21, (1 << 22) | 5], np.uint64)
    idx = KmerIndex.build(kmers, [np.zeros(0, np.uint32)] * 4, k, max_tids=4)
    tables, mode = idx.packed_tables(dense_lists=True)
    assert tables["arena"][:4, 1:].sum() == 0
    fused = idx.fused_tables()
    assert fused is not None
    dev = idx.to_device()
    hi, lo = split64(kmers)
    f, n, t, m = (np.asarray(x) for x in dev.lookup(
        np.asarray(hi), np.asarray(lo), np.ones(4, bool)))
    assert f.all() and (n == 0).all() and not m.any()
    # unknown layout strings raise instead of silently picking windowed
    import pytest

    with pytest.raises(ValueError):
        idx.to_device(layout="direct")


def test_device_lookup_paged_layout():
    """The paged 2-gather capacity layout must match the host oracle and the
    windowed layout exactly, hits and misses alike — including deep buckets
    that force extra fine-bucket bits (e > 0) and empty tid lists."""
    rng = np.random.default_rng(9)
    k = 12
    kmers, lists = random_db(rng, 400, k, 8)
    idx = KmerIndex.build(kmers, lists, k, max_tids=8)
    dev = idx.to_device(layout="paged")
    assert dev.paged_tab is not None and dev.arena_mode[0] == "paged"
    queries = np.concatenate(
        [kmers, rng.integers(0, 1 << (2 * k), size=200).astype(np.uint64)]
    )
    hi, lo = split64(queries)
    args = (np.asarray(hi).reshape(1, -1), np.asarray(lo).reshape(1, -1),
            np.ones((1, len(queries)), bool))
    f1, n1, t1, m1 = (np.asarray(x) for x in dev.lookup(*args))
    devw = idx.to_device(layout="window")
    f2, n2, t2, m2 = (np.asarray(x) for x in devw.lookup(*args))
    assert np.array_equal(f1, f2)
    assert np.array_equal(n1, n2)
    assert np.array_equal(t1, t2)
    assert np.array_equal(m1, m2)
    for j, q in enumerate(queries):
        host = idx.lookup_host(int(q))
        if host is None:
            assert not f1[0, j]
        else:
            assert f1[0, j] and n1[0, j] == host[0]
            assert np.array_equal(t1[0, j][m1[0, j]], host[1])


def test_paged_layout_deep_buckets_and_validity():
    """1500 suffixes in ONE coarse bucket: paged_tables must raise e until
    the deepest fine bucket fits a page, and invalid queries stay invalid."""
    rng = np.random.default_rng(10)
    k = 12
    lows = rng.choice(np.arange(0, 1 << 16, dtype=np.uint64), size=1500,
                      replace=False)
    kmers = np.sort((np.uint64(0xA) << np.uint64(20)) | lows)
    lists = [np.sort(rng.choice(10000, size=rng.integers(1, 9),
                                replace=False)).astype(np.uint32)
             for _ in range(len(kmers))]
    idx = KmerIndex.build(kmers, lists, k, max_tids=8)
    ptab, pages, e, P = idx.paged_tables()
    assert e > 0  # deep bucket forced finer splitting
    dev = idx.to_device(layout="paged")
    queries = np.concatenate(
        [kmers[:300], rng.integers(0, 1 << (2 * k), size=100).astype(np.uint64)]
    )
    hi, lo = split64(queries)
    valid = np.ones(len(queries), bool)
    valid[::3] = False
    f, n, t, m = (np.asarray(x) for x in dev.lookup(
        np.asarray(hi), np.asarray(lo), valid))
    for j, q in enumerate(queries):
        host = idx.lookup_host(int(q))
        if not valid[j] or host is None:
            assert not f[j]
        else:
            assert f[j] and n[j] == host[0]
            assert np.array_equal(t[j][m[j]], host[1])


def test_paged_layout_empty_lists_and_empty_index():
    k = 12
    kmers = np.array([3, 77, 1 << 21, (1 << 22) | 5], np.uint64)
    idx = KmerIndex.build(kmers, [np.zeros(0, np.uint32)] * 4, k, max_tids=4)
    dev = idx.to_device(layout="paged")
    hi, lo = split64(kmers)
    f, n, t, m = (np.asarray(x) for x in dev.lookup(
        np.asarray(hi), np.asarray(lo), np.ones(4, bool)))
    assert f.all() and (n == 0).all() and not m.any()
    # empty index: still probeable, everything misses
    empty = KmerIndex.build(np.zeros(0, np.uint64), [], k, max_tids=4)
    deve = empty.to_device(layout="paged")
    f, n, t, m = (np.asarray(x) for x in deve.lookup(
        np.asarray(hi), np.asarray(lo), np.ones(4, bool)))
    assert not f.any()


def test_small_k_rejected_with_documented_error():
    """k <= 10 (the legacy-TaxTable regime, SURVEY.md §2.1) is rejected with
    the documented geometry error at both build and encode time — no shipped
    reference DB uses small k and content_summ's small-k counting needs no
    DB, so the framework refuses rather than carrying an untested path."""
    import numpy as np
    import pytest

    from lmat_tpu.apps.make_db import build_from_tax_histo
    from lmat_tpu.core.encoding import device_canonical_kmers

    with pytest.raises(ValueError, match="below the supported minimum k=11"):
        build_from_tax_histo([], k=10)
    codes = np.zeros((2, 32), np.int32)
    valid = np.ones((2, 32), bool)
    with pytest.raises(ValueError, match="below the supported minimum k=11"):
        device_canonical_kmers(codes, valid, 10)
    # k=11 (the boundary) is accepted by the geometry check
    hi, lo, wv = device_canonical_kmers(codes, valid, 11)
    assert hi.shape == (2, 22)
