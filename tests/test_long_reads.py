"""Contig/long-read support: a 50 kb contig must classify bit-identically to
the exact host path via the position-axis chunked device probe — single-chip
and with the chunk rows sharded over a mesh (SURVEY.md §2.3 sequence axis)."""

import os

import numpy as np
import pytest

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.apps.read_label_device import (
    chunk_long_read,
    chunk_lookups_to_positions,
    prepare_reads,
)
from lmat_tpu.apps.read_label_fast import FastClassifier
from lmat_tpu.apps.read_label_host import Classifier, ScoreOptions
from lmat_tpu.apps.read_label_score_device import DeviceScorer, DeviceScorerConfig
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io.fasta import iter_reads_lmat

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
K = 20


def _contig(target=50_000):
    """A 50 kb contig: fixture genome segments interleaved with random and
    degenerate stretches (exercises run restarts + cross-chunk duplicates)."""
    rng = np.random.default_rng(5)
    segs = []
    genomes = [s for _, s in iter_reads_lmat(FIX + "/genomes.fa")]
    n = 0
    gi = 0
    while n < target:
        g = genomes[gi % len(genomes)]
        seg = g[: min(len(g), 3000)]
        segs.append(seg)
        segs.append("".join(rng.choice(list("ACGTN"), size=37)))
        # re-use an earlier slice so k-mers repeat ACROSS chunk boundaries
        segs.append(seg[100:600])
        n += len(seg) + 37 + 500
        gi += 1
    return "".join(segs)[:target]


def _setup():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    tax.load_depth_file(FIX + "/depth.dat")
    tax.load_rank_file(FIX + "/ranks.dat")
    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=K, max_tids=8)
    return tax, idx


def test_chunking_partitions_positions():
    seq = "ACGT" * 3000  # 12 kb
    batch, n_pos, stride = chunk_long_read(seq, K)
    assert n_pos == len(seq) - K + 1
    # every global window's bases must appear verbatim in its owning chunk
    b = seq.encode()
    for p in (0, 1, stride - 1, stride, stride + 1, 2 * stride, n_pos - 1):
        c, lp = divmod(p, stride)
        assert bytes(batch[c, lp : lp + K]) == b[p : p + K]


def test_long_read_matches_exact_host():
    tax, idx = _setup()
    contig = _contig()
    opts = ScoreOptions(min_kmer=30, prn_all=True)

    exact = Classifier(tax, idx, opts)
    want = exact.classify("contig1", contig)

    scorer = DeviceScorer(tax, DeviceScorerConfig(max_candidates=64, min_kmer=30))
    dev = scorer.remap_index_tids(idx).to_device()
    fast = FastClassifier(dev, scorer, k=K)
    fast.set_fallback(Classifier(tax, idx, opts))
    got = fast.long_read_line("contig1", contig)
    assert got == want
    assert fast.track_count == exact.track_count


def test_cli_fast_mode_routes_contigs(tmp_path):
    """End-to-end: a stream mixing short reads and a 50 kb contig through
    `read-label --mode fast` matches exact mode byte-for-byte on every line."""
    tax, idx = _setup()
    idx.save(str(tmp_path / "db"))
    contig = _contig(20_000)
    reads_fa = tmp_path / "mixed.fa"
    with open(reads_fa, "w") as f:
        shorts = [(h, s) for h, s in iter_reads_lmat(FIX + "/reads.fa")][:40]
        for h, s in shorts[:20]:
            f.write(f">{h}\n{s}\n")
        f.write(f">contig1\n{contig}\n")
        for h, s in shorts[20:]:
            f.write(f">{h}\n{s}\n")

    from lmat_tpu.cli.main import main

    common = [
        "--lmat-dir", FIX, "read-label", "-d", str(tmp_path / "db"),
        "-i", str(reads_fa), "-c", f"{FIX}/taxtree.dat",
        "-e", f"{FIX}/depth.dat", "-w", f"{FIX}/ranks.dat",
        "-u", f"{FIX}/taxids.info",
    ]
    main(common + ["-o", str(tmp_path / "ex"), "--mode", "exact"])
    main(common + ["-o", str(tmp_path / "fa"), "--mode", "fast", "--batch", "16",
                   "--max-candidates", "64"])

    exact_lines = open(tmp_path / "ex0.out").read()
    fast_lines = open(tmp_path / "fa0.out").read()
    # fast mode is call-identical; the contig line itself must be
    # byte-identical (it went through the exact epilogue)
    ex = {l.split("\t")[0]: l for l in exact_lines.splitlines() if l}
    fa = {l.split("\t")[0]: l for l in fast_lines.splitlines() if l}
    assert set(ex) == set(fa)
    assert fa["contig1"] == ex["contig1"]
    for h in ex:
        assert ex[h].split("\t")[-1] == fa[h].split("\t")[-1], h  # same call
    assert open(tmp_path / "fa.0.30.fastsummary").read()


def test_long_read_sharded_mesh():
    """Position-axis split across chips: chunk rows probed through the
    mesh-sharded all-to-all lookup give the same bit-identical line."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from lmat_tpu.parallel.mesh import make_mesh
    from lmat_tpu.parallel.router import ShardedIndex, make_sharded_lookup

    tax, idx = _setup()
    contig = _contig()
    opts = ScoreOptions(min_kmer=30, prn_all=True)
    exact = Classifier(tax, idx, opts)
    want = exact.classify("contig1", contig)

    mesh = make_mesh(data=2, db=4)
    sidx = ShardedIndex.from_index(idx, 4)
    batch, n_pos, stride = chunk_long_read(contig, K)
    R, CL = batch.shape
    P = CL - K + 1
    Q = R * P
    pad = (-Q) % mesh.size
    lookup = make_sharded_lookup(mesh, sidx, q_per_device=(Q + pad) // mesh.size)

    @jax.jit
    def chunk_probe(arr):
        prep = prepare_reads(arr, K)
        hi = jnp.concatenate([prep["hi"].reshape(-1), jnp.zeros(pad, jnp.uint32)])
        lo = jnp.concatenate([prep["lo"].reshape(-1), jnp.zeros(pad, jnp.uint32)])
        v = jnp.concatenate([prep["qvalid"].reshape(-1), jnp.zeros(pad, bool)])
        found, ng, tids, tmask, ovf = lookup(hi, lo, v)
        T = tids.shape[-1]
        return (found[:Q].reshape(R, P), ng[:Q].reshape(R, P),
                tids[:Q].reshape(R, P, T), tmask[:Q].reshape(R, P, T), ovf)

    found, ng, tids, tmask, ovf = jax.device_get(chunk_probe(batch))
    assert int(ovf) == 0
    lookups = chunk_lookups_to_positions(found, ng, tids, tmask, n_pos, stride)
    clf = Classifier(tax, idx, opts)
    got = clf.classify("contig1", contig, lookups=lookups)
    assert got == want
