"""Device pipeline vs host path: stage equivalence and end-to-end
bit-identical classification through the exact-mode epilogue."""

import os

import numpy as np
import pytest

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_device import DevicePipeline, pad_batch
from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
from lmat_tpu.core.encoding import ReadKmers
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


@pytest.fixture(scope="module")
def env():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    reads = []
    for i, (hdr, seq) in enumerate(iter_reads_lmat(FIX + "/reads.fa")):
        reads.append((hdr or f"unknown_hdr:{i + 1}", seq))
    return tax, idx, reads


def test_prepare_matches_host(env):
    tax, idx, reads = env
    seqs = [s for _, s in reads[:64]]
    batch = pad_batch(seqs)
    pipe = DevicePipeline(idx.to_device(), k=20)
    out = pipe(batch)
    qvalid = np.asarray(out["qvalid"])
    wvalid = np.asarray(out["wvalid"])
    vk = np.asarray(out["valid_kmers"])
    vgc = np.asarray(out["valid_gc"])
    vtot = np.asarray(out["valid_tot"])
    for b, s in enumerate(seqs):
        rk = ReadKmers(s.encode(), 20)
        P = max(len(s) - 20 + 1, 0)
        if P <= 0:
            assert vk[b] == 0
            continue
        assert np.array_equal(wvalid[b, :P], rk.valid)
        assert np.array_equal(qvalid[b, :P], rk.valid & ~rk.is_dup)
        assert not wvalid[b, P:].any()
        assert vk[b] == rk.valid_kmers
        assert vgc[b] == rk.valid_gc_cnt
        assert vtot[b] == rk.valid_tot_cnt


def test_probe_matches_host_lookup(env):
    tax, idx, reads = env
    seqs = [s for _, s in reads[:64]]
    batch = pad_batch(seqs)
    pipe = DevicePipeline(idx.to_device(), k=20)
    lookups = pipe.lookups_for_epilogue(batch)
    for b, s in enumerate(seqs):
        rk = ReadKmers(s.encode(), 20)
        for p in range(rk.kmers.shape[0]):
            if rk.valid[p] and not rk.is_dup[p]:
                host = idx.lookup_host(int(rk.kmers[p]))
                dev = lookups[b][p]
                if host is None:
                    assert not dev[0]
                else:
                    assert dev[0] and dev[1] == host[0]
                    assert np.array_equal(np.asarray(dev[2]), host[1])


def test_end_to_end_bit_identical_via_device_probe(env):
    tax, idx, reads = env
    opts = ScoreOptions(
        min_score=0.0, min_kmer=30, diff_thresh=1.0, diff_thresh2=0.0, prn_all=True
    )
    clf = Classifier(tax, idx, opts)
    pipe = DevicePipeline(idx.to_device(), k=20)
    golden = open(FIX + "/work/rl_nonull0.out").read().splitlines()
    n = 128
    batch = pad_batch([s for _, s in reads[:n]])
    lookups = pipe.lookups_for_epilogue(batch)
    for i in range(n):
        hdr, seq = reads[i]
        line = clf.classify(hdr, seq, lookups=lookups[i] if len(seq) >= 20 else None)
        assert line == golden[i], f"read {i}:\nmine: {line}\nref:  {golden[i]}"


def test_k18_pipeline_host_device_agree():
    """18-mer geometry (the reference's production marker-DB k): prefix is
    16 bits, suffix 20; the device pipeline must match host lookups."""
    import numpy as np

    from lmat_tpu.apps.read_label_device import DevicePipeline, pad_batch
    from lmat_tpu.core.encoding import ReadKmers
    from lmat_tpu.core.index import KmerIndex

    rng = np.random.default_rng(11)
    k = 18
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = bytes(rng.choice(bases, size=3000)).decode()
    # build an index over the genome's canonical k-mers
    seen = {}
    rk = ReadKmers(genome.encode(), k)
    for p in np.nonzero(rk.valid & ~rk.is_dup)[0]:
        seen.setdefault(int(rk.kmers[p]), set()).add(7 + int(p) % 5)
    kmers = np.array(sorted(seen), np.uint64)
    lists = [np.array(sorted(seen[int(m)]), np.uint32) for m in kmers]
    idx = KmerIndex.build(kmers, lists, k, max_tids=8)

    reads = [genome[i : i + 120] for i in range(0, 1200, 120)]
    reads += ["".join(rng.choice(list("ACGT")) for _ in range(100)) for _ in range(4)]
    pipe = DevicePipeline(idx.to_device(), k=k)
    lookups = pipe.lookups_for_epilogue(pad_batch(reads))
    for ri, read in enumerate(reads):
        rk = ReadKmers(read.encode(), k)
        for p in range(len(read) - k + 1):
            if not rk.valid[p] or rk.is_dup[p]:
                continue
            host = idx.lookup_host(int(rk.kmers[p]))
            found, ng, tids = lookups[ri][p]
            if host is None:
                assert not found
            else:
                assert found and ng == host[0]
                assert np.array_equal(np.asarray(tids), host[1])
