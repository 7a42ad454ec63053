"""Device data plane for content_summ — multi-k distinct-k-mer counting.

The reference's content_summ spends its time extracting canonical k-mers at
several k per read and set-inserting them per taxid
(/root/reference/src/content_summ.cpp:116-155,527-571).  The host path here
(apps/content_summ.py) vectorizes that per 16k-read batch; this module moves
the whole data plane onto the TPU:

  * canonical (fwd/rev) windows for every k in one doubling pass, k-mers kept
    as split (hi, lo) uint32 lanes (no x64 needed; lo = low 20 bits matching
    core/encoding's device representation);
  * within-read dedup AND cross-read per-(taxid, k-mer) counting in one
    variadic sort per k: sort (tid, hi, lo, row), mark first occurrences per
    read, take prefix-sum differences at group boundaries;
  * group compaction to a bounded output via one more sort (scatter-free —
    TPU scatters are slow, sorts are ~3 ms for millions of keys).

Counting (tid, kmer) groups on device shrinks the device->host transfer by
the cross-read duplication factor — the realistic regime (deep coverage of
few organisms, the reference's own example) dedups heavily.  If a batch
produces more groups than the output cap, the caller falls back to the host
path for that batch (the framework's standard overflow degrade).

Output feeds ContentSummarizer.kmer_track as (kmers u64, counts) chunks;
histograms then merge weighted (apps/content_summ.py:_comp_kmer_cov), so
.summ/_kmer_cov bytes are identical to the host path.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..core.encoding import _CODE_LUT, SUF_BITS

LO_MASK = (1 << SUF_BITS) - 1

# Lane invariant: a window of width w bits (w <= 40) is held as
# hi = value >> 20 (<= 20 bits) and lo = value & LO_MASK.  All shifts below
# rely on w <= 40 so every partial shift amount stays < 32.


def _shl(hi, lo, t: int):
    """(hi,lo) << t, static t in [0, 40], result width still <= 40 bits."""
    import jax.numpy as jnp

    if t == 0:
        return hi, lo
    if t < SUF_BITS:
        nh = (hi << t) | (lo >> (SUF_BITS - t))
        nl = (lo << t) & jnp.uint32(LO_MASK)
    else:
        # result width <= 40 forces hi == 0 here; low lane moves up entirely
        nh = lo << (t - SUF_BITS)
        nl = jnp.zeros_like(lo)
    return nh, nl


def _shr(hi, lo, t: int):
    """(hi,lo) >> t, static t in [0, 40]."""
    import jax.numpy as jnp

    if t == 0:
        return hi, lo
    if t < SUF_BITS:
        nl = ((lo >> t) | (hi << (SUF_BITS - t))) & jnp.uint32(LO_MASK)
        nh = hi >> t
    else:
        nl = hi >> (t - SUF_BITS)  # hi <= 20 bits, so this is the whole value
        nh = jnp.zeros_like(hi)
    return nh, nl


def _mask_low(hi, lo, t: int):
    """(hi,lo) & ((1<<t)-1), static t."""
    import jax.numpy as jnp

    if t <= SUF_BITS:
        return jnp.zeros_like(hi), lo & jnp.uint32((1 << t) - 1)
    return hi & jnp.uint32((1 << (t - SUF_BITS)) - 1), lo


def _shift_rows(x, width: int):
    """x[:, p] <- x[:, p + width], zero-filled on the right."""
    import jax.numpy as jnp

    return jnp.concatenate(
        [x[:, width:], jnp.zeros((x.shape[0], width), x.dtype)], axis=1
    )


def build_windows(codes, kmax: int):
    """codes uint8 [N, L] (255 = invalid) -> forward/reverse kmax-wide
    windows as (fhi, flo, rhi, rlo) uint32 [N, L] plus csp int32 [N, L+1]
    (csp[:, p] = count of valid bases in [0, p), for per-k validity).

    Doubling combine (host twin: apps/content_summ.py:_flush_batch):
      W_{j+s}(p) = W_j(p) << 2s | W_s(p+j),
    forward prefix W_s = W_j >> 2(j-s), reverse prefix = W_j & mask(2s).
    """
    import jax.numpy as jnp

    c32 = (codes & jnp.uint8(3)).astype(jnp.uint32)
    valid = codes != jnp.uint8(255)
    fhi, flo = jnp.zeros_like(c32), c32
    rhi, rlo = jnp.zeros_like(c32), c32 ^ jnp.uint32(3)
    width = 1
    while width < kmax:
        s = min(width, kmax - width)
        pfh, pfl = (fhi, flo) if s == width else _shr(fhi, flo, 2 * (width - s))
        prh, prl = (rhi, rlo) if s == width else _mask_low(rhi, rlo, 2 * s)
        nfh, nfl = _shl(fhi, flo, 2 * s)
        nfh = nfh | _shift_rows(pfh, width)
        nfl = nfl | _shift_rows(pfl, width)
        ah, al = _shl(_shift_rows(prh, width), _shift_rows(prl, width), 2 * width)
        rhi, rlo = rhi | ah, rlo | al
        fhi, flo = nfh, nfl
        width += s
    csp = jnp.zeros((codes.shape[0], codes.shape[1] + 1), jnp.int32)
    csp = csp.at[:, 1:].set(jnp.cumsum(valid.astype(jnp.int32), axis=1))
    return fhi, flo, rhi, rlo, csp


@lru_cache(maxsize=64)
def _compiled_counter(shape, k_list, cap: int):
    import jax
    import jax.numpy as jnp

    kmax = max(k_list)
    N, L = shape
    SENT = jnp.int32(0x7FFFFFFF)

    @jax.jit
    def run(codes, tids):
        fhi, flo, rhi, rlo, csp = build_windows(codes, kmax)
        row = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, L))
        out = {}
        for k in k_list:
            fh, fl = _shr(fhi, flo, 2 * (kmax - k))
            rh, rl = _mask_low(rhi, rlo, 2 * k)
            use_rev = (rh < fh) | ((rh == fh) & (rl < fl))
            ch = jnp.where(use_rev, rh, fh)
            cl = jnp.where(use_rev, rl, fl)
            ok = jnp.zeros((N, L), bool)
            if L - k + 1 > 0:
                ok = ok.at[:, : L - k + 1].set(
                    (csp[:, k:] - csp[:, : L - k + 1]) == k
                )
            tid = jnp.where(ok, tids[:, None], SENT)
            st, sh, sl, sr = jax.lax.sort(
                (tid.reshape(-1), ch.reshape(-1), cl.reshape(-1),
                 row.reshape(-1)),
                num_keys=4,
            )
            ok_s = st != SENT
            same_kmer = (
                (st[1:] == st[:-1]) & (sh[1:] == sh[:-1]) & (sl[1:] == sl[:-1])
            )
            dup_in_read = same_kmer & (sr[1:] == sr[:-1])
            first = jnp.concatenate([jnp.ones(1, bool), ~dup_in_read]) & ok_s
            new_group = jnp.concatenate([jnp.ones(1, bool), ~same_kmer]) & ok_s
            cf = jnp.cumsum(first.astype(jnp.int32))
            gid = jnp.cumsum(new_group.astype(jnp.int32))
            n_groups = jnp.where(ok_s, gid, 0).max()
            # compact group starts to the front, in order (scatter-free)
            not_start = (~new_group).astype(jnp.int32)
            idx = jnp.arange(st.shape[0], dtype=jnp.int32)
            _, _, gt, gh, gl, gcf = jax.lax.sort(
                (not_start, idx, st, sh, sl, cf), num_keys=2
            )
            gt, gh, gl, gcf = gt[:cap], gh[:cap], gl[:cap], gcf[:cap]
            # group g spans [p_g, p_{g+1}); every group start carries first=1,
            # so its read-count = cf[p_{g+1}] - cf[p_g] (last: cf_end - cf + 1)
            nxt = jnp.concatenate([gcf[1:], cf[-1][None]])
            ar = jnp.arange(cap, dtype=jnp.int32)
            cnt = jnp.where(ar == n_groups - 1, cf[-1] - gcf + 1, nxt - gcf)
            vmask = ar < n_groups
            out[k] = (
                jnp.where(vmask, gt, 0),
                jnp.where(vmask, gh, 0),
                jnp.where(vmask, gl, 0),
                jnp.where(vmask, cnt, 0),
                n_groups,
            )
        return out

    return run


def count_batch_device(codes, tids, k_list, cap: int):
    """One flush on device.  codes uint8 [N, L]; tids int32 [N]; returns per
    k: (tid, hi, lo, count) arrays [cap] + n_groups (n_groups > cap means
    overflow: discard and redo on host).  Compiled per (N, L, k_list, cap)."""
    run = _compiled_counter(codes.shape, tuple(sorted(set(k_list))), cap)
    return run(codes, tids)


class DeviceFlusher:
    """Drop-in replacement for ContentSummarizer's host flush: pads each
    pending batch to shape buckets, runs count_batch_device, and returns
    host-side (k, tid, (kmers u64, counts)) chunks; overflow or any device
    failure falls back to the host path for that batch."""

    def __init__(self, k_list, host_fallback, cap_ratio: int = 2,
                 cap_override: int | None = None):
        self.k_list = tuple(sorted(set(k_list)))
        self.host_fallback = host_fallback  # callable(pending) -> chunks
        self.cap_ratio = cap_ratio
        self.cap_override = cap_override  # tests / tuning

    @staticmethod
    def _pad_shape(n, length):
        def up(x, lo):
            p = lo
            while p < x:
                p *= 2
            return p

        return up(max(n, 256), 256), up(max(length, 128), 128)

    def flush(self, pending):
        """pending: list of (tid, read_bytes)."""
        import jax

        kmax = max(self.k_list)
        N = len(pending)
        lens = [len(r) for _, r in pending]
        Np, Lp = self._pad_shape(N, max(lens) + kmax)
        mat = np.zeros((Np, Lp), np.uint8)
        for i, (_, r) in enumerate(pending):
            mat[i, : lens[i]] = np.frombuffer(r, np.uint8)
        codes = _CODE_LUT[mat]
        codes[N:] = 255
        tids = np.full(Np, 0x7FFFFFFF, np.int32)
        tids[:N] = [t for t, _ in pending]
        cap = self.cap_override or max(1 << 16, (N * Lp) // self.cap_ratio)
        try:
            res = jax.device_get(
                count_batch_device(codes, tids, self.k_list, cap)
            )
        except Exception:  # no usable device: host path
            return self.host_fallback(pending)
        out = []
        for k in self.k_list:
            gt, gh, gl, cnt, n_groups = res[k]
            n = int(n_groups)
            if n > cap:
                return self.host_fallback(pending)
            gt, gh, gl, cnt = (np.asarray(x[:n]) for x in (gt, gh, gl, cnt))
            kmers = (gh.astype(np.uint64) << np.uint64(SUF_BITS)) | gl.astype(
                np.uint64
            )
            bounds = np.nonzero(np.diff(gt))[0] + 1
            starts = (
                np.concatenate([[0], bounds]) if n else np.zeros(0, np.int64)
            )
            for s0, km, ct in zip(
                starts, np.split(kmers, bounds), np.split(cnt, bounds)
            ):
                out.append((k, int(gt[s0]), (km, ct.astype(np.int64))))
        return out
