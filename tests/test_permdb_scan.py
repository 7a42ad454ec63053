"""Generic (non-shim) PERM heap-image decode: signature scan + base recovery.

The published reference DBs are perm-je heap images with no shim header: the
SortedDb object must be FOUND by signature scan, and the mapping base address
recovered from the saved root pointer (io/permdb.py:118-175; ref
include/perm.h:133-195).  These tests synthesize such images — shifted base
address, allocator padding between arrays, decoy struct signatures and decoy
pointers — and require the decode to reproduce the source index exactly.
"""

import struct

import numpy as np
import pytest

from lmat_tpu.core.index import KmerIndex
from lmat_tpu.io.permdb import (
    load_perm_db, read_header, save_perm_db, _geometry,
)


def random_index(rng, n, k, max_tids, tid_space=90000):
    kmers = np.unique(
        rng.integers(0, 1 << (2 * k), size=2 * n, dtype=np.uint64)
    )[:n]
    lens = rng.integers(1, max_tids + 1, size=n)
    flat = rng.integers(2, tid_space, size=int(lens.sum())).astype(np.uint32)
    return KmerIndex.build_flat(kmers, flat, lens, k=k, max_tids=max_tids)


def repack_generic(shim_path: str, out_path: str, base: int, rng,
                   gaps=(4096, 1 << 20, 64, 4096)) -> None:
    """Rewrite a shim image as a generic perm-je-style heap: arbitrary
    header junk, root pointer hidden among decoys, allocator gaps between
    the object and each array, pointers rebased to ``base``."""
    hdr = read_header(shim_path)
    mm = np.memmap(shim_path, dtype=np.uint8, mode="r")
    _, tt = _geometry(hdr.k)
    ttb = bytes(mm[hdr.ttb_off : hdr.ttb_off + 8 * tt])
    kt = bytes(mm[hdr.ktable_off : hdr.ktable_off + 8 * hdr.n_kmers])
    storage = bytes(mm[hdr.storage_off :])

    def align16(x):
        return (x + 15) & ~15

    head = 1 << 16  # junk header region holding roots
    obj_off = align16(head + gaps[0])
    ttb_off = align16(obj_off + 88 + gaps[3])
    kt_off = align16(ttb_off + len(ttb) + gaps[2])
    st_off = align16(kt_off + len(kt) + gaps[1])
    fsize = st_off + len(storage) + 512

    out = np.zeros(fsize, np.uint8)
    # header junk: random bytes + decoy u64 "pointers" + the real root
    junk = rng.integers(0, 256, size=head, dtype=np.uint8)
    junk[: 8 * 64] = 0
    out[:head] = junk
    decoys = np.array(
        [base - 8, base + fsize + 64, 0xDEADBEEF, base + obj_off + 16],
        np.uint64,
    )
    out[64 : 64 + decoys.nbytes] = decoys.view(np.uint8)
    out[256 : 256 + 8] = np.uint64(base + obj_off).reshape(1).view(np.uint8)

    # decoy struct signature: valid idx_config, implausible pointers
    decoy_obj = struct.pack("<ixxxxQB7xQQQQ", 2025, 1 << 50, 20, 1, 2, 3, 0)
    out[1024 : 1024 + len(decoy_obj)] = np.frombuffer(decoy_obj, np.uint8)

    obj = struct.pack(
        "<ixxxxQB7xQQQQ",
        2027 if hdr.k == 20 else 1827,
        hdr.n_kmers, hdr.k,
        base + st_off, base + kt_off, base + ttb_off, hdr.n_kmers,
    )
    out[obj_off : obj_off + len(obj)] = np.frombuffer(obj, np.uint8)
    out[ttb_off : ttb_off + len(ttb)] = np.frombuffer(ttb, np.uint8)
    out[kt_off : kt_off + len(kt)] = np.frombuffer(kt, np.uint8)
    out[st_off : st_off + len(storage)] = np.frombuffer(storage, np.uint8)
    out.tofile(out_path)


@pytest.mark.parametrize("k,tid_bytes", [(20, 4), (18, 4), (20, 2)])
def test_generic_image_roundtrip(tmp_path, k, tid_bytes):
    rng = np.random.default_rng(20240 + k + tid_bytes)
    idx = random_index(rng, 3000, k, 6,
                       tid_space=60000 if tid_bytes == 2 else 900000)
    shim = str(tmp_path / "shim.db")
    save_perm_db(idx, shim, tid_bytes=tid_bytes)
    gen = str(tmp_path / "generic.db")
    base = int(0x7F3A_0000_0000 + 4096 * rng.integers(1, 1 << 20))
    repack_generic(shim, gen, base, rng)

    got = load_perm_db(gen)  # no shim magic -> generic scan branch
    assert got.k == k and got.n_kmers == idx.n_kmers
    # bit-exact: every stored k-mer and its taxid list, plus misses
    own_counts = np.diff(np.asarray(idx.bucket_start, np.int64))
    prefix = np.repeat(np.arange(len(own_counts), dtype=np.uint64), own_counts)
    kmers = (prefix << np.uint64(20)) | idx.suffix.astype(np.uint64)
    sample = rng.choice(idx.n_kmers, size=400, replace=False)
    for i in sample:
        a = idx.lookup_host(int(kmers[i]))
        b = got.lookup_host(int(kmers[i]))
        assert a is not None and b is not None
        assert a[0] == b[0] and np.array_equal(a[1], b[1])
    present = set(kmers.tolist())
    misses = 0
    while misses < 50:
        km = int(rng.integers(0, 1 << (2 * k)))
        if km in present:
            continue
        assert got.lookup_host(km) is None
        misses += 1


def test_generic_image_16bit_conv_map(tmp_path):
    rng = np.random.default_rng(7)
    idx = random_index(rng, 500, 20, 4, tid_space=60000)
    shim = str(tmp_path / "shim16.db")
    save_perm_db(idx, shim, tid_bytes=2)
    gen = str(tmp_path / "gen16.db")
    repack_generic(shim, gen, 0x5555_0000_0000, rng)
    conv = {100000 + t: t for t in range(60000)}
    got = load_perm_db(gen, conv_map=conv)
    assert got.conv_table is not None
    own_counts = np.diff(np.asarray(idx.bucket_start, np.int64))
    prefix = np.repeat(np.arange(len(own_counts), dtype=np.uint64), own_counts)
    kmers = (prefix << np.uint64(20)) | idx.suffix.astype(np.uint64)
    a = idx.lookup_host(int(kmers[17]))
    b = got.lookup_host(int(kmers[17]))
    assert np.array_equal(b[1], a[1] + 100000)


def test_corrupt_ttb_rejected(tmp_path):
    rng = np.random.default_rng(9)
    idx = random_index(rng, 800, 20, 4)
    shim = str(tmp_path / "shim.db")
    save_perm_db(idx, shim)
    gen = str(tmp_path / "gen.db")
    repack_generic(shim, gen, 0x6000_0000_0000, rng)
    hdr = read_header(gen)
    mm = np.memmap(gen, dtype=np.uint8, mode="r+")
    # break the offset-tiling invariant in a nonzero top-tier entry
    _, tt = _geometry(20)
    ttb = mm[hdr.ttb_off : hdr.ttb_off + 8 * tt].view(np.uint64)
    nz = np.nonzero(ttb)[0]
    ttb[nz[len(nz) // 2]] += np.uint64(3)
    mm.flush()
    del mm
    with pytest.raises(ValueError):
        load_perm_db(gen)
