"""Binary interchange formats of the reference toolchain.

All little-endian, layouts verified against the reference writers:

* file metadata header (KmerFileMetaData.cpp:149-227):
    [data_start u32][kmer_count u64][sanity u64 = ~0][version u32]
    [has_locations char 'Y'/'N'][kmer_len u32]               (29 bytes)
* kmerPrefixCounter record (kmerPrefixCounter.cpp:179-212), version 1:
    [kmer u64][ct u32][gid u32 x ct]   + sanity u64 every 1000 records
* tax_histo record (tax_histo.cpp:254-283), version 999:
    [kmer u64][ct u16][tid u32 x ct]   + sanity u64 every 1500 records

These are both an ingest path (parity with reference-built artifacts) and the
interchange emitted by our own build tools.
"""

from __future__ import annotations

import struct

import numpy as np

SANITY = 0xFFFFFFFFFFFFFFFF
TAX_HISTO_VERSION = 999
KMER_SANITY_COUNT = 1000
TAX_HISTO_SANITY_COUNT = 1500


def read_metadata(f):
    data_start = struct.unpack("<I", f.read(4))[0]
    kmer_count = struct.unpack("<Q", f.read(8))[0]
    sanity = struct.unpack("<Q", f.read(8))[0]
    assert sanity == SANITY, "corrupt metadata header"
    version = struct.unpack("<I", f.read(4))[0]
    has_loc = f.read(1) == b"Y"
    kmer_len = struct.unpack("<I", f.read(4))[0]
    assert f.tell() == data_start
    return {"kmer_count": kmer_count, "version": version, "has_locations": has_loc, "k": kmer_len}


def write_metadata(f, kmer_count: int, version: int, k: int, has_loc: bool = False):
    payload = (
        struct.pack("<Q", kmer_count)
        + struct.pack("<Q", SANITY)
        + struct.pack("<I", version)
        + (b"Y" if has_loc else b"N")
        + struct.pack("<I", k)
    )
    f.write(struct.pack("<I", 4 + len(payload)))
    f.write(payload)


def _read_records(path, ct_fmt, ct_size, sanity_every):
    """Yield (kmer, np.uint32 tid array) records; verifies sanity words."""
    with open(path, "rb") as f:
        meta = read_metadata(f)
        n = meta["kmer_count"]
        for i in range(n):
            head = f.read(8 + ct_size)
            if len(head) < 8 + ct_size:
                break
            kmer = struct.unpack("<Q", head[:8])[0]
            ct = struct.unpack(ct_fmt, head[8:])[0]
            tids = np.frombuffer(f.read(4 * ct), dtype="<u4")
            yield kmer, tids
            if (i + 1) % sanity_every == 0:
                s = struct.unpack("<Q", f.read(8))[0]
                assert s == SANITY, f"corrupt record stream at {i}"


def read_kpc_file(path):
    """Records of a kmerPrefixCounter output shard."""
    yield from _read_records(path, "<I", 4, KMER_SANITY_COUNT)


def read_tax_histo(path):
    """Records of a tax_histo (v999) file."""
    with open(path, "rb") as f:
        v = read_metadata(f)["version"]
    assert v == TAX_HISTO_VERSION, f"not a tax_histo file (version {v})"
    yield from _read_records(path, "<H", 2, TAX_HISTO_SANITY_COUNT)


def write_kpc_file(path, records, k: int):
    """records: iterable of (kmer, iterable-of-tids), ascending by kmer."""
    with open(path, "wb") as f:
        write_metadata(f, 0, 1, k)
        n = 0
        for kmer, tids in records:
            tids = np.asarray(tids, np.uint32)
            f.write(struct.pack("<QI", kmer, len(tids)))
            f.write(tids.astype("<u4").tobytes())
            n += 1
            if n % KMER_SANITY_COUNT == 0:
                f.write(struct.pack("<Q", SANITY))
        f.seek(0)
        write_metadata(f, n, 1, k)
    return n


def write_tax_histo(path, records, k: int):
    with open(path, "wb") as f:
        write_metadata(f, 0, TAX_HISTO_VERSION, k)
        n = 0
        for kmer, tids in records:
            tids = np.asarray(tids, np.uint32)
            f.write(struct.pack("<QH", kmer, len(tids)))
            f.write(tids.astype("<u4").tobytes())
            n += 1
            if n % TAX_HISTO_SANITY_COUNT == 0:
                f.write(struct.pack("<Q", SANITY))
        f.seek(0)
        write_metadata(f, n, TAX_HISTO_VERSION, k)
    return n
