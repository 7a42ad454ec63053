"""Encoding tests: host path against a straightforward per-base reference
implementation written from the documented semantics, and device path against
the host path."""

import numpy as np
import pytest

from lmat_tpu.core.encoding import (
    ReadKmers,
    genome_canonical_kmers,
    device_ascii_to_codes,
    device_canonical_kmers,
    pack64,
)

CODE = {"a": 0, "c": 1, "g": 2, "t": 3}


def slow_encode(kmer: str) -> int:
    v = 0
    for ch in kmer:
        v = (v << 2) | CODE[ch.lower()]
    return v


def slow_rc(kmer: int, k: int) -> int:
    out = 0
    for _ in range(k):
        out = (out << 2) | (3 - (kmer & 3))
        kmer >>= 2
    return out


def slow_genome_kmers(seq: str, k: int):
    """Sliding window that restarts after degenerate bases."""
    out = []
    run = ""
    for ch in seq + "N":
        if ch.lower() in CODE:
            run += ch
        else:
            for i in range(len(run) - k + 1):
                f = slow_encode(run[i : i + k])
                out.append(min(f, slow_rc(f, k)))
            run = ""
    return out


def test_genome_kmers_basic():
    seq = "ACGTACGTTTGACNACGTACGTAAACCCGGGTTT"
    for k in (4, 5, 8):
        got = genome_canonical_kmers(seq.encode(), k)
        assert list(got) == slow_genome_kmers(seq, k)


def test_genome_kmers_random():
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGTNacgtn", dtype=np.uint8)
    for k in (11, 20):
        seq = bytes(rng.choice(alphabet, size=500))
        got = genome_canonical_kmers(seq, k)
        assert list(got) == slow_genome_kmers(seq.decode(), k)


def test_read_kmers_gc_and_dedup():
    # read: AAAA appears twice for k=4 -> the second window is a dup
    seq = b"AAAAAAAT"  # k=4 windows: AAAA x4 (3 dups), AAAT
    rk = ReadKmers(seq, 4)
    assert rk.valid_kmers == 5
    assert rk.valid.sum() == 5
    assert rk.is_dup.tolist() == [False, True, True, True, False]
    assert rk.valid_tot_cnt == 8 and rk.valid_gc_cnt == 0
    assert rk.bin_sel == 0


def test_read_kmers_short_runs_excluded():
    # run "ACG" (len 3) < k=4 never completes a window -> excluded from GC
    rk = ReadKmers(b"ACGNACGTGGGG", 4)
    assert rk.valid_tot_cnt == 8  # only ACGTGGGG
    assert rk.valid_gc_cnt == 6
    assert rk.valid_kmers == 5


def test_device_matches_host():
    rng = np.random.default_rng(1)
    alphabet = np.frombuffer(b"ACGTN", dtype=np.uint8)
    k = 20
    B, L = 8, 120
    batch = rng.choice(alphabet, size=(B, L))
    codes, valid = device_ascii_to_codes(batch)
    hi, lo, wvalid = device_canonical_kmers(codes, valid, k)
    packed = pack64(np.asarray(hi), np.asarray(lo))
    for b in range(B):
        rk = ReadKmers(bytes(batch[b]), k)
        assert np.array_equal(np.asarray(wvalid)[b], rk.valid)
        assert np.array_equal(packed[b][rk.valid], rk.kmers[rk.valid])


def test_nibble_pack_roundtrip():
    """pack_nibbles/device_nibbles_to_codes match device_ascii_to_codes on
    mixed-case, degenerate-base, and zero-padded batches."""
    import numpy as np

    from lmat_tpu.core.encoding import (
        device_ascii_to_codes,
        device_nibbles_to_codes,
        pack_nibbles,
    )

    rng = np.random.default_rng(3)
    alphabet = np.frombuffer(b"ACGTacgtNnRYX-", np.uint8)
    arr = rng.choice(alphabet, size=(17, 64)).astype(np.uint8)
    arr[3, 40:] = 0  # zero padding tail
    arr[5, :] = 0
    codes_a, valid_a = (np.asarray(x) for x in device_ascii_to_codes(arr))
    packed = pack_nibbles(arr)
    assert packed.shape == (17, 32) and packed.dtype == np.uint8
    codes_p, valid_p = (np.asarray(x) for x in device_nibbles_to_codes(packed))
    assert (codes_a == codes_p).all()
    assert (valid_a == valid_p).all()
