"""Canonical 2-bit k-mer encoding — host (NumPy) and device (JAX) paths.

Semantics replicated from the reference implementation (cited for parity):
  * genome extraction: /root/reference/src/kmerdb/Encoder.hpp:96-215 — slide a
    2-bit window over the sequence, restart after any non-ACGT base (a k-mer
    never spans a degenerate base).
  * read scanning: /root/reference/src/read_label.cpp:943-1017 — same restart
    rule, canonical k-mer = min(forward, reverse-complement), within-read
    duplicate k-mers are skipped (their position stays invalid), and GC
    statistics are accumulated only over bases inside runs that produced at
    least one valid k-mer.

Device representation: a k-mer (2k bits, k<=26) is held as two uint32 lanes,
``hi = kmer >> 20`` and ``lo = kmer & 0xFFFFF``.  20 low bits were chosen so
the ``hi`` lane is directly the bucket id of the two-level index (see
core/index.py) for k=20.
"""

from __future__ import annotations

import numpy as np

SUF_BITS = 20

# The device index geometry requires k >= 11 (the high k-mer lane, bits
# above SUF_BITS, is the coarse bucket id — at 2k <= SUF_BITS there are no
# high bits to bucket by).  This matches every DB the reference ships
# (k in {18, 20}; /root/reference/bin/get_db.sh catalog) and the reference
# use cases for smaller k — content_summ's multi-k counting
# (src/content_summ.cpp:116-155) — need no DB at all.  The reference's
# legacy TaxTable (src/kmerdb/TaxTable.hpp:81-190) would accept small k but
# no shipped pipeline builds such a DB; this framework rejects it with this
# documented error rather than carrying an untested path.
SMALL_K_MESSAGE = (
    "k={k} is below the supported minimum k=11: the two-level device index "
    "buckets k-mers by their bits above {suf} (SUF_BITS), so 2k must exceed "
    "{suf}.  All reference-shipped databases use k=18 or k=20; small-k "
    "k-mer counting (content_summ) does not use a database."
).replace("{suf}", str(SUF_BITS))
SUF_MASK = (1 << SUF_BITS) - 1

# ---------------------------------------------------------------------------
# Host (NumPy) path — used by the DB builder and the reference-exact epilogue.
# ---------------------------------------------------------------------------

# Map ASCII -> 2-bit code; 255 marks a degenerate (non-ACGT) base.
_CODE_LUT = np.full(256, 255, dtype=np.uint8)
for _c, _v in (("a", 0), ("c", 1), ("g", 2), ("t", 3)):
    _CODE_LUT[ord(_c)] = _v
    _CODE_LUT[ord(_c.upper())] = _v

_GC_LUT = np.zeros(256, dtype=np.uint8)
for _c in "gGcC":
    _GC_LUT[ord(_c)] = 1


def ascii_to_codes(seq: bytes | np.ndarray):
    """Return (codes uint8 [L] with 255=invalid, valid bool [L])."""
    arr = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else np.asarray(seq, dtype=np.uint8)
    codes = _CODE_LUT[arr]
    return codes, codes != 255


def _window_kmers(codes: np.ndarray, k: int):
    """Forward and reverse-complement 2-bit k-mers at every window position.

    codes: uint8 [L] (invalid entries may hold 255; caller masks validity).
    Returns (fwd uint64 [L-k+1], rev uint64 [L-k+1]).
    """
    L = codes.shape[0]
    P = L - k + 1
    if P <= 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    c = (codes & np.uint8(3)).astype(np.uint64)
    fwd = np.zeros(P, np.uint64)
    rev = np.zeros(P, np.uint64)
    for i in range(k):
        ci = c[i : i + P]
        fwd |= ci << np.uint64(2 * (k - 1 - i))
        rev |= (ci ^ np.uint64(3)) << np.uint64(2 * i)
    return fwd, rev


def window_valid(valid: np.ndarray, k: int) -> np.ndarray:
    """Boolean [L-k+1]: window of k consecutive valid bases starting here."""
    L = valid.shape[0]
    P = L - k + 1
    if P <= 0:
        return np.zeros(0, bool)
    cs = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
    return (cs[k : k + P] - cs[:P]) == k


def genome_canonical_kmers(seq: bytes, k: int) -> np.ndarray:
    """All canonical k-mers of a genome sequence, in sequence order.

    Equivalent to repeatedly calling Encoder::next + min(kmer, rc):
    one k-mer per window of k consecutive ACGT bases.
    """
    codes, valid = ascii_to_codes(seq)
    wv = window_valid(valid, k)
    fwd, rev = _window_kmers(codes, k)
    can = np.minimum(fwd, rev)
    return can[wv]


class ReadKmers:
    """Per-read canonical k-mer scan with the read_label bookkeeping.

    Attributes (P = len(seq) - k + 1 window positions):
      kmers      uint64 [P]  canonical k-mer per position (garbage where ~valid)
      valid      bool   [P]  window is fully ACGT
      is_dup     bool   [P]  valid window whose k-mer appeared at an earlier
                             valid position (reference skips these before
                             marking the position, read_label.cpp:1009-1017)
      valid_kmers  int       number of valid windows (dups included)
      bin_sel      int       GC bin (gc%/10) over bases of valid runs
    """

    def __init__(self, seq: bytes, k: int):
        codes, valid = ascii_to_codes(seq)
        L = codes.shape[0]
        self.k = k
        self.length = L
        wv = window_valid(valid, k)
        fwd, rev = _window_kmers(codes, k)
        can = np.minimum(fwd, rev)
        self.kmers = can
        self.valid = wv
        self.valid_kmers = int(wv.sum())

        # duplicate detection among valid windows, first occurrence wins
        isdup = np.zeros(wv.shape, bool)
        if self.valid_kmers:
            idx = np.nonzero(wv)[0]
            vals = can[idx]
            _, first = np.unique(vals, return_index=True)
            keep = np.zeros(idx.shape, bool)
            keep[first] = True
            isdup[idx[~keep]] = True
        self.is_dup = isdup

        # GC statistics: a base contributes iff it lies in a run of >=k valid
        # bases (read_label.cpp:988-1008 — counters reset on invalid bases and
        # are flushed into the valid totals each time a window completes).
        run_id = np.cumsum(~valid)  # constant within a run of valid bases
        gc = _GC_LUT[np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else np.asarray(seq, np.uint8)].astype(np.int64)
        if L:
            nruns = int(run_id[-1]) + 1
            runs = np.bincount(run_id[valid], minlength=nruns)
            long_run = np.zeros(nruns, bool)
            long_run[runs >= k] = True
            base_in_long = valid & long_run[run_id]
            self.valid_tot_cnt = int(base_in_long.sum())
            self.valid_gc_cnt = int(gc[base_in_long].sum())
        else:
            self.valid_tot_cnt = 0
            self.valid_gc_cnt = 0

        if self.valid_tot_cnt > 0:
            # C arithmetic: (float)gc / (float)tot (f32), * 100.0 in double,
            # truncated back to float on assignment; bin = (int)(gc_pcnt / 10).
            ratio = np.float32(self.valid_gc_cnt) / np.float32(self.valid_tot_cnt)
            gc_pcnt = np.float32(np.float64(ratio) * 100.0)
            self.bin_sel = int(np.float32(gc_pcnt) / np.float32(10.0))
        else:
            self.bin_sel = 0


# ---------------------------------------------------------------------------
# Device (JAX) path — two-lane uint32 k-mers.
# ---------------------------------------------------------------------------

def _jax():
    import jax.numpy as jnp

    return jnp


# 4-bit base alphabet for the packed host->device transfer: 0..3 = acgt
# (either case), 4 = any other base (invalid), 15 = zero padding.  Two bases
# per byte halves the input upload, which is critical-path bandwidth on
# remote host<->device links (the reference reads ASCII from a local queue,
# read_label.cpp:1651-1713 — a TPU feeder ships bytes instead).
_NIB_LUT = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate(b"acgt"):
    _NIB_LUT[_c] = _i
    _NIB_LUT[_c - 32] = _i  # upper case
_NIB_LUT[0] = 15


def pack_nibbles(arr: np.ndarray) -> np.ndarray:
    """[B, L] uint8 ASCII (L even) -> [B, L/2] uint8, two 4-bit base codes
    per byte (even position in the high nibble).  Host numpy."""
    assert arr.shape[1] % 2 == 0, "pad length must be even to nibble-pack"
    nib = _NIB_LUT[arr]
    return (nib[:, 0::2] << 4) | nib[:, 1::2]


def device_nibbles_to_codes(packed):
    """[B, L/2] uint8 packed nibbles -> (codes int32 0..3, valid bool) of
    shape [B, L].  Device-side inverse of pack_nibbles."""
    jnp = _jax()
    p = packed.astype(jnp.int32)
    B, L2 = p.shape
    nib = jnp.stack([p >> 4, p & 15], axis=-1).reshape(B, 2 * L2)
    valid = nib < 4
    return jnp.where(valid, nib, 0), valid


def device_ascii_to_codes(batch):
    """[B, L] uint8 ASCII -> (codes int32 0..3, valid bool). JAX arrays."""
    jnp = _jax()
    b = batch.astype(jnp.int32)
    lower = jnp.where((b >= 65) & (b <= 90), b + 32, b)  # tolower
    codes = jnp.select(
        [lower == ord("a"), lower == ord("c"), lower == ord("g"), lower == ord("t")],
        [0, 1, 2, 3],
        -1,
    )
    return jnp.maximum(codes, 0), codes >= 0


def device_canonical_kmers(codes, valid, k: int):
    """Batched canonical k-mers as uint32 lanes.

    codes: [B, L] int32 in 0..3; valid: [B, L] bool.
    Returns (hi [B,P] uint32, lo [B,P] uint32, wvalid [B,P] bool), P = L-k+1.
    hi holds kmer bits >= SUF_BITS, lo the low SUF_BITS bits.
    """
    jnp = _jax()
    B, L = codes.shape
    P = L - k + 1
    if not 2 * k > SUF_BITS:
        raise ValueError(SMALL_K_MESSAGE.format(k=k))
    assert P > 0 and k <= 26

    u = codes.astype(jnp.uint32)
    fwd_hi = jnp.zeros((B, P), jnp.uint32)
    fwd_lo = jnp.zeros((B, P), jnp.uint32)
    rev_hi = jnp.zeros((B, P), jnp.uint32)
    rev_lo = jnp.zeros((B, P), jnp.uint32)
    for i in range(k):
        ci = jax_slice(u, i, P)
        comp = ci ^ jnp.uint32(3)
        fbit = 2 * (k - 1 - i)  # forward: base i sits at bit 2*(k-1-i)
        rbit = 2 * i            # reverse-complement: base i sits at bit 2*i
        if fbit >= SUF_BITS:
            fwd_hi |= ci << jnp.uint32(fbit - SUF_BITS)
        else:
            fwd_lo |= ci << jnp.uint32(fbit)
        if rbit >= SUF_BITS:
            rev_hi |= comp << jnp.uint32(rbit - SUF_BITS)
        else:
            rev_lo |= comp << jnp.uint32(rbit)

    use_fwd = (fwd_hi < rev_hi) | ((fwd_hi == rev_hi) & (fwd_lo <= rev_lo))
    hi = jnp.where(use_fwd, fwd_hi, rev_hi)
    lo = jnp.where(use_fwd, fwd_lo, rev_lo)

    iv = valid.astype(jnp.int32)
    cs = jnp.cumsum(iv, axis=1)
    cs = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cs], axis=1)
    wvalid = (cs[:, k : k + P] - cs[:, :P]) == k
    return hi, lo, wvalid


def jax_slice(x, start, length):
    import jax.lax as lax

    return lax.dynamic_slice_in_dim(x, start, length, axis=1)


def pack64(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Host-side: combine uint32 lanes back into uint64 k-mers."""
    return (hi.astype(np.uint64) << np.uint64(SUF_BITS)) | lo.astype(np.uint64)


def split64(kmers: np.ndarray):
    """Host-side: uint64 k-mers -> (hi uint32, lo uint32) lanes."""
    kmers = kmers.astype(np.uint64)
    return (kmers >> np.uint64(SUF_BITS)).astype(np.uint32), (
        kmers & np.uint64(SUF_MASK)
    ).astype(np.uint32)


def host_gc_bins(batch: np.ndarray, k: int) -> np.ndarray:
    """Per-read GC bins for a [B, L] uint8 batch, exact C semantics.

    Computed on the host because the f32 division must be IEEE
    correctly-rounded: TPU lowers f32 division to a reciprocal sequence that
    can land one ulp low, flipping the truncation at exact bin boundaries
    (e.g. 97/194 -> 0.49999997 -> bin 4 instead of 0.5 -> bin 5).  Same
    statistics as ReadKmers: bases inside runs of >= k valid bases
    (read_label.cpp:988-1008, 1205-1206).
    """
    batch = np.asarray(batch, np.uint8)
    B, L = batch.shape
    codes = _CODE_LUT[batch]
    valid = codes != 255
    gc = _GC_LUT[batch].astype(np.int64)
    run_id = np.cumsum(~valid, axis=1) + np.arange(B)[:, None] * (L + 1)
    runs = np.bincount(run_id[valid], minlength=B * (L + 1))
    long_base = valid & (runs[run_id] >= k)
    tot = long_base.sum(axis=1)
    g = (gc * long_base).sum(axis=1)
    ratio = np.where(
        tot > 0,
        np.float32(g.astype(np.float32)) / np.maximum(tot, 1).astype(np.float32),
        np.float32(0),
    ).astype(np.float32)
    pct = (ratio.astype(np.float64) * 100.0).astype(np.float32)
    return (pct / np.float32(10.0)).astype(np.int32)
