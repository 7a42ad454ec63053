"""Null (random-read) model: loading and cutoff preparation.

Replicates loadRandHits (/root/reference/src/read_label.cpp:512-678):

* a list file of ``read_len path`` rows (paths resolved under $LMAT_DIR);
* each file: first line = num_bins, then rows
  ``tid class-str {num_obs max_val kmer_cnt} x bins``;
* cutoff rules per bin:
    - num_obs == 0 and kmer_cnt >= 100000  -> 0.5 (GC profile unreachable)
    - num_obs == 0 and kmer_cnt <  100000  -> fill from nearest observed bin
      (max of the two equidistant neighbors), else 0.5
    - num_obs > 0                          -> max_val
* the e-coli row (562) is remembered and substituted for 28384
  ("other sequences"), whose class becomes genus;
* class names starting "no_" collapse to genus;
* read-length selection: sorted lengths with midpoint boundaries
  (closest(), read_label.cpp:107-133), defaulting to 80.

Values are float32 to match the reference's float parsing.
"""

from __future__ import annotations

import gzip
import os

import numpy as np

F = np.float32


class NullModel:
    def __init__(self):
        # read_len -> {tid -> [F]*bins}; read_len -> {tid -> class str}
        self.rand_hits: dict[int, dict[int, list]] = {}
        self.rand_class: dict[int, dict[int, str]] = {}
        self.read_len_vec = [0]
        self.read_len_avgs: list[int] = []

    @classmethod
    def load(cls, list_file: str, lmat_dir: str | None = None) -> "NullModel":
        nm = cls()
        with open(list_file) as lf:
            for line in lf:
                toks = line.split()
                if len(toks) < 2:
                    continue
                read_len = int(toks[0])
                path = toks[1]
                if lmat_dir is None:
                    lmat_dir = os.environ.get("LMAT_DIR")
                if lmat_dir:
                    path = os.path.join(lmat_dir, path)
                nm.read_len_vec.append(read_len)
                if not os.path.exists(path):
                    continue
                nm._load_file(read_len, path)
        nm.read_len_vec.sort()
        nm.read_len_avgs = [
            (nm.read_len_vec[i - 1] + nm.read_len_vec[i]) // 2
            for i in range(1, len(nm.read_len_vec))
        ]
        return nm

    def _load_file(self, read_len: int, path: str):
        opener = gzip.open if _is_gzip(path) else open
        rand_hits: dict[int, list] = {}
        rand_class: dict[int, str] = {}
        with opener(path, "rt") as f:
            header = f.readline()
            num_bins = int(header.split()[0])
            assert num_bins > 0
            save_ecoli = [F(0.5)] * num_bins
            for line in f:
                toks = line.split()
                if not toks:
                    continue
                tid = int(toks[0])
                class_str = toks[1]
                val = class_str.split("-", 1)[0]
                if len(val) >= 3 and val.startswith("no_"):
                    val = "genus"
                cutoff = [F(0)] * num_bins
                revisit = []
                for b in range(num_bins):
                    num_obs = int(toks[2 + 3 * b])
                    max_val = F(toks[2 + 3 * b + 1])
                    kmer_cnt = int(toks[2 + 3 * b + 2])
                    if num_obs == 0 and kmer_cnt >= 100000:
                        cutoff[b] = F(0.5)
                    elif num_obs == 0 and kmer_cnt < 100000:
                        revisit.append(b)
                    if num_obs > 0:
                        cutoff[b] = max_val
                        if tid == 562:
                            save_ecoli[b] = cutoff[b]
                    if tid == 28384:
                        val = "genus"
                        cutoff = list(save_ecoli)
                for b in revisit:
                    j = b - 1
                    i = b + 1
                    while j >= 0 or i < num_bins:
                        a_val = cutoff[j] if j >= 0 else F(0)
                        b_val = cutoff[i] if i < num_bins else F(0)
                        if a_val > 0 and b_val > 0:
                            cutoff[b] = max(a_val, b_val)
                        elif a_val > 0:
                            cutoff[b] = a_val
                        elif b_val > 0:
                            cutoff[b] = b_val
                        if cutoff[b] > 0:
                            break
                        j -= 1
                        i += 1
                    if cutoff[b] <= 0:
                        cutoff[b] = F(0.5)
                rand_hits[tid] = cutoff
                rand_class[tid] = val
        self.rand_hits[read_len] = rand_hits
        self.rand_class[read_len] = rand_class

    # closest()/getReadLen (read_label.cpp:107-133)
    def get_read_len(self, value: int) -> int:
        i = 0
        for i in range(len(self.read_len_avgs)):
            if value <= self.read_len_avgs[i]:
                res = self.read_len_vec[i]
                return res if res > 0 else 80
        res = self.read_len_vec[len(self.read_len_avgs)] if self.read_len_vec else 0
        return res if res > 0 else 80


def _is_gzip(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == b"\x1f\x8b"
