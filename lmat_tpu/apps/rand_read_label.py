"""Null-model generation — random-read scoring (rand_read_label equivalent).

Replicates /root/reference/src/rand_read_label.cpp + src/rkmer.hpp: synthesize
reads cycling 10 GC bins (genRandRead, :85-103), classify each with the same
candidate-retrieval loop as read_label (rkmer.hpp — no human collapse, whole
read GC), and keep per-(taxid, gc-bin) the max match fraction
(found / valid_kmers) and observation count.  Output: ``.rand_lst`` rows
``tid {max_score cnt} x bins``.

The reference seeds rand() with the wall clock, so byte-identity is undefined;
we use a seeded NumPy generator for reproducibility.
"""

from __future__ import annotations

import numpy as np

from ..io.cppfmt import fmt_float
from .read_label_host import Classifier, ScoreOptions

F = np.float32


def gen_rand_read(rng, read_len: int, beg: int, end: int) -> str:
    """genRandRead: draw GC%, fill gc then at, shuffle."""
    gc_draw = int(rng.integers(beg, end + 1))
    num_gc = int((gc_draw / 100.0) * read_len)
    arr = np.empty(read_len, dtype="<U1")
    arr[:num_gc] = rng.choice(["g", "c"], size=num_gc)
    arr[num_gc:] = rng.choice(["a", "t"], size=read_len - num_gc)
    rng.shuffle(arr)
    return "".join(arr)


class RandReadLabeler:
    def __init__(self, taxonomy, index, max_count: int = -1, num_bins: int = 10,
                 device: bool = False, batch: int = 1024, max_candidates: int = 128):
        opts = ScoreOptions(max_count=max_count)
        self.clf = Classifier(taxonomy, index, opts)
        self.num_bins = num_bins
        # tid -> [max_score] * bins ; tid -> [count] * bins
        self.max_match: dict[int, list] = {}
        self.match_cnt: dict[int, list] = {}
        self.device = device
        self.batch = batch
        if device:
            assert max_count <= 0, "query-time pruning is a host-path option"
            import jax

            from .read_label_device import prepare_reads, probe
            from .read_label_score_device import DeviceScorer, DeviceScorerConfig

            cfg = DeviceScorerConfig(max_candidates=max_candidates)
            scorer = DeviceScorer(taxonomy, cfg)
            dev = scorer.remap_index_tids(index).to_device()
            k = index.k

            def step(dev, batch_arr):
                pr = probe(dev, prepare_reads(batch_arr, k))
                # rkmer.hpp lacks the human collapse (rand_read_label shares
                # the loop but scores raw taxids)
                pres = scorer._presence(pr, collapse_human=False)
                raw = pres["pk"][..., 5]  # raw taxids per candidate
                return (raw, pres["found_cnt"], pres["n_cand"],
                        pres["valid_kmers"], pres["overflow"])

            import functools

            self._step = functools.partial(jax.jit(step), dev)

    def gc_ranges(self, num_bins=None):
        """Bin GC ranges as computed at rand_read_label.cpp:668-685."""
        n = num_bins or self.num_bins
        width = 100.0 / n
        out = []
        lval = 0.0
        for i in range(n):
            i_lval = int(F(lval))
            rval = int(F(lval + width - 1))
            out.append((i_lval, rval))
            lval += width
        return out

    def process_read(self, read: str, gc_bucket: int):
        k = self.clf.k
        if len(read) < k:
            return
        (label_first, label_sets, taxid_lst, _t2i, valid_kmers, _bin) = self.clf._retrieve(
            read, collapse_human=False
        )
        if valid_kmers <= 0:
            return
        cnt_tids: dict[int, int] = {}
        for s in label_sets:
            for tid in s:
                cnt_tids[tid] = cnt_tids.get(tid, 0) + 1
        for tid in sorted(cnt_tids):  # map iteration order
            label_prob = F(cnt_tids[tid]) / F(valid_kmers)
            if tid not in self.max_match:
                self.max_match[tid] = [F(0)] * self.num_bins
                self.match_cnt[tid] = [0] * self.num_bins
                self.max_match[tid][gc_bucket] = label_prob
                self.match_cnt[tid][gc_bucket] = 1
            else:
                cur = self.max_match[tid][gc_bucket]
                if cur < label_prob:
                    self.max_match[tid][gc_bucket] = label_prob
                self.match_cnt[tid][gc_bucket] += 1

    def run(self, num_reads: int, read_len: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        ranges = self.gc_ranges()
        if self.device:
            return self._run_device(num_reads, read_len, rng, ranges)
        for i in range(num_reads):
            b = i % self.num_bins
            beg, end = ranges[b]
            self.process_read(gen_rand_read(rng, read_len, beg, end), b)

    def _run_device(self, num_reads: int, read_len: int, rng, ranges):
        """Batched device scoring of the synthetic reads: same presence
        pipeline as fast-mode read_label (see DeviceScorer._presence), with
        the per-(taxid, gc-bin) max/count merge on the host."""
        import jax

        from .read_label_device import pad_batch

        B = self.batch
        reads = []
        for i in range(num_reads):
            b = i % self.num_bins
            beg, end = ranges[b]
            reads.append((gen_rand_read(rng, read_len, beg, end), b))
        pad_to = -(-read_len // 128) * 128
        for s in range(0, len(reads), B):
            chunk = reads[s : s + B]
            seqs = [r for r, _ in chunk] + [""] * (B - len(chunk))
            raw, found, n_cand, valid, overflow = jax.device_get(
                self._step(pad_batch(seqs, pad_to=pad_to))
            )
            assert int(np.max(overflow)) == 0, "raise max_candidates"
            for i, (_, gc_bucket) in enumerate(chunk):
                vk = int(valid[i])
                if vk <= 0:
                    continue
                nc = int(n_cand[i])
                for j in range(nc):
                    cnt = int(found[i, j])
                    if cnt == 0:
                        continue
                    tid = int(raw[i, j])
                    label_prob = F(cnt) / F(vk)
                    if tid not in self.max_match:
                        self.max_match[tid] = [F(0)] * self.num_bins
                        self.match_cnt[tid] = [0] * self.num_bins
                        self.max_match[tid][gc_bucket] = label_prob
                        self.match_cnt[tid][gc_bucket] = 1
                    else:
                        if self.max_match[tid][gc_bucket] < label_prob:
                            self.max_match[tid][gc_bucket] = label_prob
                        self.match_cnt[tid][gc_bucket] += 1

    def write_rand_lst(self, path: str):
        with open(path, "w") as f:
            for tid in sorted(self.max_match):
                parts = [str(tid)]
                for b in range(self.num_bins):
                    parts.append(fmt_float(self.max_match[tid][b]))
                    parts.append(str(self.match_cnt[tid][b]))
                f.write(" ".join(parts) + "\n")
