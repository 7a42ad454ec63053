"""Regression tests for the round-2 advisor findings (ADVICE.md).

1. content_summ batched flush must handle k >= 26 (tag width > 64 bits)
   by chunking the row axis, not asserting.
2. The native FASTA batcher must keep header/row alignment when the header
   buffer fills (truncate content, never the NUL separator).
"""

import numpy as np
import pytest

from lmat_tpu.apps.content_summ import ContentSummarizer, ContentSummOptions
from lmat_tpu.io.native_loader import NativeBatcher, native_available


class _Tax:
    rank = {}


_CODE = {65: 0, 67: 1, 71: 2, 84: 3, 97: 0, 99: 1, 103: 2, 116: 3}


def _brute_canonical(seq: str, k: int):
    """Independent per-read canonical-k-mer extraction with within-read
    dedup in first-occurrence order (duplicates dropped)."""
    out, seen = [], set()
    b = seq.encode()
    for p in range(len(b) - k + 1):
        window = b[p : p + k]
        if any(ch not in _CODE for ch in window):
            continue
        fwd = 0
        rev = 0
        for i, ch in enumerate(window):
            c = _CODE[ch]
            fwd = (fwd << 2) | c
            rev |= (c ^ 3) << (2 * i)
        can = min(fwd, rev)
        if can not in seen:
            seen.add(can)
            out.append(can)
    return np.array(sorted(out), np.uint64)


@pytest.mark.parametrize("k", [26, 30, 31])
def test_flush_batch_large_k_chunks(k):
    """k >= 26 leaves < 14 tag bits for the row id: the flush must chunk the
    row axis (k=30 -> 16 rows/chunk) and still match brute force."""
    rng = np.random.default_rng(7)
    reads = [
        "".join(rng.choice(list("ACGTN"), size=int(L), p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        for L in rng.integers(k + 2, 90, size=40)
    ]
    tids = [int(t) for t in rng.integers(2, 5, size=len(reads))]

    cs = ContentSummarizer(_Tax(), ContentSummOptions(k_list=(k,)))
    for r, t in zip(reads, tids):
        cs._store_kmers(r, t)
    cs._flush()

    want: dict[int, list[np.ndarray]] = {}
    for r, t in zip(reads, tids):
        km = _brute_canonical(r, k)
        if km.size:
            want.setdefault(t, []).append(km)

    got_tids = set(cs.kmer_track[k])
    assert got_tids == set(want)
    for tid, chunks in want.items():
        a = np.sort(np.concatenate(chunks))
        b = np.sort(np.concatenate(cs.kmer_track[k][tid]).astype(np.uint64))
        assert a.shape == b.shape and (a == b).all(), tid


@pytest.mark.skipif(not native_available(), reason="no C++ compiler")
def test_native_header_buffer_overflow_keeps_alignment(tmp_path):
    """With a header buffer far too small for the batch, every read must
    still get a header slot (possibly truncated/empty) so rows align."""
    p = tmp_path / "r.fa"
    n = 32
    with open(p, "w") as f:
        for i in range(n):
            f.write(f">read_{i}_{'x' * 40}\n" + "ACGT" * 8 + "\n")
    batches = list(NativeBatcher(str(p), 64, 64, hdr_buf_cap=100))
    assert len(batches) == 1
    batch, lengths, headers = batches[0]
    assert len(headers) == n
    assert (lengths == 32).all()
    # the first headers fit untruncated; each row's sequence is intact
    assert headers[0] == f"read_0_{'x' * 40}"
    for i in range(n):
        assert bytes(batch[i][:32]) == b"ACGT" * 8
