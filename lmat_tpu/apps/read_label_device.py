"""Batched device classification pipeline (TPU path).

Stage layout (all shapes static, everything under one jit):

  [B, L] uint8 ASCII reads
    -> 2-bit codes + validity                 (VPU select)
    -> canonical k-mers as uint32 lanes       (k shifted or-accumulations)
    -> within-read duplicate suppression      (pairwise compare, lower-tri any)
    -> GC / valid-window statistics           (cumsum windows)
    -> two-level index probe                  (gathers + branchless bsearch)
    -> per-position taxid lists [B, P, T]     (masked arena gather)

The output feeds either the reference-exact host epilogue
(apps/read_label_host.Classifier, bit-identical mode) or the device scorer
(fast mode, apps/read_label_score_device.py).

Exact-mode equivalence with the host path is covered by tests/test_device.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.encoding import device_ascii_to_codes, device_canonical_kmers


def pad_batch(seqs: list, pad_to: int | None = None, multiple: int = 32):
    # default pad multiple 32 (was 128): every padded window is a wasted
    # probe query, and short-read batches pay ~25% for the coarser rounding
    """Pack python strings into a [B, L] uint8 array (zero padded)."""
    B = len(seqs)
    maxlen = max((len(s) for s in seqs), default=1)
    L = pad_to or -(-maxlen // multiple) * multiple
    out = np.zeros((B, L), np.uint8)
    for i, s in enumerate(seqs):
        b = s.encode() if isinstance(s, str) else s
        b = b[:L]
        out[i, : len(b)] = np.frombuffer(b, np.uint8)
    return out


def prepare_reads(batch, k: int, packed: bool = False):
    """Stages 1-3: codes -> canonical kmers -> dedup + stats.

    batch: [B, L] uint8 ASCII (jax or numpy), or — with packed=True — the
    [B, L/2] nibble-packed form from core.encoding.pack_nibbles (half the
    host->device upload bytes). Returns a dict of [B, P]/[B] arrays:
      hi, lo        uint32   canonical k-mer lanes
      qvalid        bool     valid window AND first occurrence (queryable)
      wvalid        bool     valid window (dups included)
      valid_kmers   int32[B]
      valid_gc/tot  int32[B] GC statistics over long-run bases
    """
    import jax.numpy as jnp

    if packed:
        from ..core.encoding import device_nibbles_to_codes

        codes, bvalid = device_nibbles_to_codes(batch)
    else:
        codes, bvalid = device_ascii_to_codes(batch)
    B, L = codes.shape
    P = L - k + 1
    hi, lo, wvalid = device_canonical_kmers(codes, bvalid, k)

    # duplicate = same canonical kmer at an earlier valid window.  Sort-based:
    # the naive pairwise form is an O(B*P^2) broadcast compare (230M elements
    # at P=237) that dominates the whole device step; two [B,P] sorts cost
    # ~1% of that.  Invalid windows get an all-ones sentinel key (canonical
    # lanes never reach it: hi < 2^(2k-20)), so within a (hi,lo) group the
    # pos key makes the earliest valid window the group head.
    import jax

    SENT = jnp.uint32(0xFFFFFFFF)
    khi = jnp.where(wvalid, hi, SENT)
    klo = jnp.where(wvalid, lo, SENT)
    posP = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None, :], (B, P))
    khi_s, klo_s, pos_s = jax.lax.sort((khi, klo, posP), dimension=1, num_keys=3)
    same_prev = jnp.concatenate(
        [jnp.zeros((B, 1), bool),
         (khi_s[:, 1:] == khi_s[:, :-1]) & (klo_s[:, 1:] == klo_s[:, :-1])],
        axis=1,
    ) & (khi_s != SENT)
    _, dup = jax.lax.sort((pos_s, same_prev.astype(jnp.int32)), dimension=1,
                          num_keys=1)
    qvalid = wvalid & ~dup.astype(bool)

    # GC statistics: bases inside runs with >= k consecutive valid bases,
    # i.e. bases covered by at least one valid window
    iv = wvalid.astype(jnp.int32)
    cw = jnp.cumsum(iv, axis=1)
    cw = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cw], axis=1)  # [B, P+1]
    # base j is covered by windows starting in [j-k+1, j] ∩ [0, P)
    j = jnp.arange(L, dtype=jnp.int32)
    lo_w = jnp.clip(j - k + 1, 0, P)
    hi_w = jnp.clip(j + 1, 0, P)
    covered = (cw[:, hi_w] - cw[:, lo_w]) > 0  # [B, L]
    is_gc = bvalid & ((codes == 1) | (codes == 2))
    valid_tot = jnp.sum((covered & bvalid).astype(jnp.int32), axis=1)
    valid_gc = jnp.sum((covered & is_gc).astype(jnp.int32), axis=1)
    valid_kmers = jnp.sum(wvalid.astype(jnp.int32), axis=1)

    # GC bin for null-model selection, C float semantics
    # (read_label.cpp:1205-1206): f32 ratio, *100 in double, truncate, /10
    ratio = valid_gc.astype(jnp.float32) / jnp.maximum(valid_tot, 1).astype(jnp.float32)
    gc_pcnt = (ratio.astype(jnp.float64) * 100.0).astype(jnp.float32)
    bin_sel = (gc_pcnt / jnp.float32(10.0)).astype(jnp.int32)

    return {
        "hi": hi,
        "lo": lo,
        "qvalid": qvalid,
        "wvalid": wvalid,
        "valid_kmers": valid_kmers,
        "valid_gc": valid_gc,
        "valid_tot": valid_tot,
        "bin_sel": bin_sel,
    }


def probe(dev_index, prep):
    """Stage 4: index probe for every window position."""
    found, ng, tids, tmask = dev_index.lookup(prep["hi"], prep["lo"], prep["qvalid"])
    return {"found": found, "ng": ng, "tids": tids, "tmask": tmask, **prep}


def probe_dedup(dev_index, prep, u_cap: int):
    """Stage 4 with CROSS-READ k-mer dedup: probe each distinct k-mer once.

    Reads from the same organism share most k-mers (at 30x coverage a genomic
    k-mer recurs in ~30 reads), so the batch's Q = B*P probe queries collapse
    to U << Q distinct k-mers.  The probe is gather-issue-bound (NOTES.md
    roofline), so replacing 3 row gathers x Q with 3 x u_cap + 1 broadcast
    row gather x Q wins whenever u_cap < ~2/3 Q.

    Mechanics (all static shapes):
      1. lexsort the flat (hi, lo) keys with their query index as payload;
      2. unique-first flags -> slot ids (cumsum);
      3. a second sort compacts the distinct keys to the front -> [u_cap];
      4. probe the distinct keys once; pack each result into one
         (meta | tids) row;
      5. a third sort inverts the permutation (cheaper than a scatter on
         TPU), and one row gather broadcasts each slot's row to its queries.

    Queries whose slot falls beyond u_cap are reported per read in
    "dedup_ovf" — the per-read overflow machinery reroutes those reads
    through the exact host path, so any u_cap is safe, merely slower when
    undersized.
    """
    import jax
    import jax.numpy as jnp

    B, P = prep["hi"].shape
    Q = B * P
    SENT = jnp.uint32(0xFFFFFFFF)
    qv = prep["qvalid"].reshape(Q)
    hi_f = jnp.where(qv, prep["hi"].reshape(Q), SENT)
    lo_f = jnp.where(qv, prep["lo"].reshape(Q), SENT)
    idx = jnp.arange(Q, dtype=jnp.int32)
    hi_s, lo_s, idx_s = jax.lax.sort((hi_f, lo_f, idx), num_keys=2)

    uniq = (
        jnp.concatenate(
            [jnp.ones(1, bool), (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]
        )
        & (hi_s != SENT)
    )
    slot = jnp.cumsum(uniq.astype(jnp.int32)) - 1  # [Q]; dups share the head's
    n_unique = slot[-1] + 1

    # compact distinct keys to the front in slot order
    key2 = jnp.where(uniq, slot, jnp.int32(Q))
    _, u_hi, u_lo = jax.lax.sort((key2, hi_s, lo_s), num_keys=1)
    u_hi, u_lo = u_hi[:u_cap], u_lo[:u_cap]
    uvalid = jnp.arange(u_cap, dtype=jnp.int32) < n_unique

    found_u, ng_u, tids_u, tmask_u = dev_index.lookup(u_hi, u_lo, uvalid)
    cnt_u = jnp.sum(tmask_u.astype(jnp.int32), axis=-1)
    meta_u = (
        found_u.astype(jnp.uint32) << 31
    ) | (cnt_u.astype(jnp.uint32) << 16) | ng_u.astype(jnp.uint32)
    row_u = jnp.concatenate([meta_u[:, None], tids_u], axis=1)  # [u_cap, 1+T]

    # invert the sort permutation (sort by idx_s beats a Q-element scatter)
    _, slot_q = jax.lax.sort((idx_s, slot), num_keys=1)  # [Q] in query order
    over_q = qv & (slot_q >= u_cap)
    sl = jnp.clip(slot_q, 0, u_cap - 1)
    row_q = jnp.take(row_u, sl, axis=0)  # ONE broadcast row gather
    meta_q = row_q[:, 0]
    ok = qv & ~over_q
    found = ok & (meta_q >> 31).astype(bool)
    ngv = jnp.where(found, meta_q & 0xFFFF, 0).astype(jnp.int32)
    T = tids_u.shape[-1]
    cnt_q = jnp.where(found, (meta_q >> 16) & 0x7FFF, 0).astype(jnp.int32)
    tmask = jnp.arange(T, dtype=jnp.int32)[None, :] < cnt_q[:, None]
    tids = jnp.where(tmask, row_q[:, 1:], jnp.uint32(0))

    return {
        "found": found.reshape(B, P),
        "ng": ngv.reshape(B, P),
        "tids": tids.reshape(B, P, T),
        "tmask": tmask.reshape(B, P, T),
        "dedup_ovf": jnp.sum(over_q.reshape(B, P).astype(jnp.int32), axis=1),
        "n_unique": n_unique,
        **prep,
    }


# ---------------------------------------------------------------------------
# Long reads / contigs: position-axis split.
#
# A read of any length is split into chunks of CHUNK_LEN bases overlapping by
# k-1, so the chunks' window ranges PARTITION the read's window positions
# (chunk c owns global windows [c*stride, (c+1)*stride), stride =
# CHUNK_LEN-k+1).  The chunk rows form a normal [rows, CHUNK_LEN] batch — on
# one chip they probe directly; on a mesh they ride the same data-parallel /
# all-to-all machinery as short reads (SURVEY.md §2.3 sequence-axis row:
# counts are associative, no ring needed).  The exact host epilogue
# (read_label_host.Classifier.classify(lookups=...)) then scores the whole
# read, so results are bit-identical to the pure host path at any length
# (the reference's arbitrary-length label_vec, read_label.cpp:1225).
# ---------------------------------------------------------------------------

LONG_CHUNK = 4096


def chunk_long_read(seq: str, k: int, chunk_len: int = LONG_CHUNK):
    """Split one long read into a [rows, chunk_len] uint8 batch.

    Returns (batch, n_pos, stride): rows are padded up to a power-of-two
    ladder so jit shapes stay bounded; padding rows are all-zero (invalid).
    """
    b = seq.encode() if isinstance(seq, str) else seq
    stride = chunk_len - (k - 1)
    n_pos = max(0, len(b) - k + 1)
    n_chunks = max(1, -(-n_pos // stride))
    rows = 1
    while rows < n_chunks:
        rows *= 2
    batch = np.zeros((rows, chunk_len), np.uint8)
    for c in range(n_chunks):
        piece = b[c * stride : c * stride + chunk_len]
        batch[c, : len(piece)] = np.frombuffer(piece, np.uint8)
    return batch, n_pos, stride


def chunk_lookups_to_positions(found, ng, tids, tmask, n_pos: int, stride: int):
    """Host-side: flatten fetched chunk-probe arrays into the per-position
    [(found, ng, tids)] list the exact epilogue consumes (each global window
    position lives in exactly one chunk: (p // stride, p % stride))."""
    found = np.asarray(found)
    ng = np.asarray(ng)
    tids = np.asarray(tids)
    tmask = np.asarray(tmask)
    lookups = []
    for p in range(n_pos):
        c, lp = divmod(p, stride)
        if found[c, lp]:
            lookups.append((True, int(ng[c, lp]), tids[c, lp][tmask[c, lp]]))
        else:
            lookups.append((False, 0, ()))
    return lookups


@dataclass
class DevicePipeline:
    """Jitted end-to-end probe pipeline bound to a device-resident index."""

    dev_index: object
    k: int

    def __post_init__(self):
        import jax

        # dev_index passes as a jit argument (pytree), not a closure constant
        def fn(dev_index, batch):
            return probe(dev_index, prepare_reads(batch, self.k))

        self._jit = jax.jit(fn)

    def __call__(self, batch):
        return self._jit(self.dev_index, batch)

    def lookups_for_epilogue(self, batch_np, n_reads=None):
        """Run the pipeline and convert to per-read per-position lookup lists
        consumed by the reference-exact host epilogue."""
        out = self._jit(self.dev_index, batch_np)
        found = np.asarray(out["found"])
        ng = np.asarray(out["ng"])
        tids = np.asarray(out["tids"])
        tmask = np.asarray(out["tmask"])
        B = found.shape[0] if n_reads is None else n_reads
        result = []
        for b in range(B):
            per_pos = []
            for p in range(found.shape[1]):
                if found[b, p]:
                    per_pos.append((True, int(ng[b, p]), tids[b, p][tmask[b, p]]))
                else:
                    per_pos.append((False, 0, ()))
            result.append(per_pos)
        return result
