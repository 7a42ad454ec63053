"""The batched multi-k k-mer counter must match the per-read reference
semantics (ReadKmers: valid windows, within-read dedup) exactly."""

import numpy as np

from lmat_tpu.apps.content_summ import ContentSummarizer, ContentSummOptions
from lmat_tpu.core.encoding import ReadKmers


class _Tax:
    rank = {}


def _reads(n, rng, lmin=15, lmax=230):
    bases = "ACGTN"
    out = []
    for _ in range(n):
        L = int(rng.integers(lmin, lmax))
        out.append(
            "".join(rng.choice(list(bases), size=L, p=[0.23, 0.23, 0.23, 0.23, 0.08]))
        )
    return out


def test_flush_batch_matches_readkmers():
    rng = np.random.default_rng(11)
    opts = ContentSummOptions(k_list=(8, 10, 14, 20))
    reads = _reads(500, rng)
    tids = rng.integers(2, 9, size=len(reads))

    cs = ContentSummarizer(_Tax(), opts)
    for r, t in zip(reads, tids):
        cs._store_kmers(r, int(t))
    cs._flush()

    want = {k: {} for k in opts.k_list}
    for r, t in zip(reads, tids):
        b = r.encode()
        for k in opts.k_list:
            if len(b) < k:
                continue
            rk = ReadKmers(b, k)
            sel = rk.valid & ~rk.is_dup
            want[k].setdefault(int(t), []).append(rk.kmers[sel])

    for k in opts.k_list:
        assert set(cs.kmer_track[k]) == set(want[k])
        for tid, chunks in want[k].items():
            a = np.sort(np.concatenate(chunks))
            b = np.sort(np.concatenate(cs.kmer_track[k][tid]))
            assert a.shape == b.shape and (a == b).all(), (k, tid)


def test_flush_batch_empty_and_short():
    opts = ContentSummOptions(k_list=(8, 20))
    cs = ContentSummarizer(_Tax(), opts)
    cs._flush()  # no pending: no-op
    cs._store_kmers("ACGT", 5)  # shorter than every k
    cs._store_kmers("ACGTACGTAC", 5)  # >= 8, < 20
    cs._flush()
    assert 5 in cs.kmer_track[8]
    assert 5 not in cs.kmer_track[20]


def test_device_flush_matches_host():
    """DeviceFlusher must produce the same per-(k, tid, kmer) read-counts as
    the host batch path (CPU jax backend; same code path as TPU)."""
    rng = np.random.default_rng(11)
    reads = _reads(300, rng)
    # repeat some reads so cross-read counts exceed 1
    reads += reads[:60]
    tids = rng.integers(1, 9, size=len(reads)).tolist()

    opts = ContentSummOptions(k_list=(8, 10, 12, 14, 17))
    host = ContentSummarizer(_Tax(), opts)
    dev = ContentSummarizer(_Tax(), ContentSummOptions(
        k_list=opts.k_list, device=True))
    for t, r in zip(tids, reads):
        host._store_kmers(r, int(t))
        dev._store_kmers(r, int(t))
    host._flush()
    dev._flush()

    def totals(cs):
        agg = {}
        for k, per_tid in cs.kmer_track.items():
            for tid, chunks in per_tid.items():
                d = agg.setdefault((k, tid), {})
                for c in chunks:
                    if isinstance(c, tuple):
                        for km, ct in zip(c[0].tolist(), c[1].tolist()):
                            d[km] = d.get(km, 0) + ct
                    else:
                        for km in c.tolist():
                            d[km] = d.get(km, 0) + 1
        return agg

    th, td = totals(host), totals(dev)
    assert set(th) == set(td)
    for key in th:
        assert th[key] == td[key], key


def test_device_flush_overflow_falls_back():
    rng = np.random.default_rng(12)
    reads = _reads(64, rng, lmin=150, lmax=230)
    opts = ContentSummOptions(k_list=(8, 17), device=True)
    cs = ContentSummarizer(_Tax(), opts)
    # tiny cap forces n_groups > cap -> host fallback chunks (bare arrays)
    cs._flusher.cap_override = 8
    for i, r in enumerate(reads):
        cs._store_kmers(r, 1 + (i % 3))
    cs._flush()
    kinds = {
        type(c)
        for per in cs.kmer_track.values()
        for chunks in per.values()
        for c in chunks
    }
    assert kinds == {np.ndarray}  # every chunk came from the host fallback
