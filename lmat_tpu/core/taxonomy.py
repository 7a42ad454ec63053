"""Taxonomy tree as dense integer arrays.

File format (reference parity: /root/reference/src/kmerdb/TaxNode.hpp:131-147,
TaxTree.hpp:24-57): two header lines to skip, a (possibly inaccurate) node
count line, then per node::

    <id> <nChildren> <child>... <parent>
    <name>

Path-to-root semantics follow TaxTree::getPathToRoot (TaxTree.hpp:60-91): the
path of a node starts at its *parent* and ends at the root (tid 1); the node
itself is excluded, and the root's path is empty.  ``is_ancestor(a, d)`` is
"a appears on d's path" — a node is not its own ancestor.

The LCA reduction used by the DB build replicates TaxTree::getLcaMap
(TaxTree.hpp:160-260).
"""

from __future__ import annotations

import numpy as np


class Taxonomy:
    def __init__(self, parent: dict[int, int], names: dict[int, str], children: dict[int, set]):
        self.parent = parent          # tid -> parent tid (root: parent == self)
        self.names = names            # tid -> name
        self.children = children      # tid -> set of child tids
        self._path_cache: dict[int, tuple[int, ...]] = {}
        self.depth: dict[int, int] = {}   # from the -e depth file (scoring)
        self.rank: dict[int, str] = {}    # from the -w rank file (gRank_table)
        self._warned_missing: set[int] = set()

    # -- construction -------------------------------------------------------

    @classmethod
    def from_lmat_file(cls, path: str) -> "Taxonomy":
        parent: dict[int, int] = {}
        names: dict[int, str] = {}
        children: dict[int, set] = {}
        with open(path) as f:
            f.readline()
            f.readline()
            f.readline()  # node-count line (unreliable; ignored)
            while True:
                header = f.readline()
                if not header:
                    break
                toks = header.split()
                if not toks:
                    continue
                tid = int(toks[0])
                nch = int(toks[1])
                childs = {int(t) for t in toks[2 : 2 + nch] if int(t) != tid}
                par = int(toks[2 + nch])
                name = f.readline().rstrip("\n")
                parent[tid] = par
                names[tid] = name
                children[tid] = childs
        # the reference drops a root self-loop child (TaxTree.hpp:56)
        if 1 in children:
            children[1].discard(1)
        return cls(parent, names, children)

    def load_depth_file(self, path: str) -> None:
        with open(path) as f:
            for line in f:
                toks = line.split()
                if len(toks) >= 2:
                    self.depth[int(toks[0])] = int(toks[1])

    def load_rank_file(self, path: str) -> None:
        with open(path) as f:
            for line in f:
                toks = line.split()
                if len(toks) >= 2:
                    self.rank[int(toks[0])] = toks[1]

    # -- queries ------------------------------------------------------------

    def __contains__(self, tid: int) -> bool:
        return tid in self.parent

    def path_to_root(self, tid: int) -> tuple[int, ...]:
        """(parent, grandparent, ..., root); empty for the root or unknown tid."""
        hit = self._path_cache.get(tid)
        if hit is not None:
            return hit
        if tid not in self.parent:
            self._path_cache[tid] = ()
            return ()
        path = []
        cur = tid
        while True:
            par = self.parent[cur]
            if par == cur:
                break
            path.append(par)
            cur = par
        out = tuple(path)
        self._path_cache[tid] = out
        return out

    def is_ancestor(self, anc: int, desc: int) -> bool:
        return anc in self.path_to_root(desc)

    def rank_of(self, tid: int) -> str:
        """gRank_table-with-operator[] semantics: missing -> empty string."""
        return self.rank.get(tid, "")

    def lca(self, tax_ids) -> int:
        """LCA per TaxTree::getLcaMap; tids missing from the tree are dropped.

        Returns 0 if no input tid is in the tree (multi-input case),
        0xFFFFFFFF for a single unknown tid — both mirror the reference.
        """
        tax_ids = set(tax_ids)
        if not tax_ids:
            raise ValueError("empty tax_ids")
        if len(tax_ids) == 1:
            (tid,) = tax_ids
            return tid if tid in self.parent else 0xFFFFFFFF
        children: dict[int, set] = {}
        good = set()
        for tid in tax_ids:
            if tid not in self.parent:
                continue
            good.add(tid)
            p = self.path_to_root(tid)
            if p:
                children.setdefault(p[0], set()).add(tid)
            for j in range(1, len(p)):
                children.setdefault(p[j], set()).add(p[j - 1])
        if not good:
            return 0
        if len(good) == 1:
            (tid,) = good
            return tid
        lca = 1
        while True:
            ch = children.get(lca, ())
            if len(ch) == 1 and lca not in tax_ids:
                lca = next(iter(ch))
            else:
                break
        return lca

    # -- dense arrays for device use ----------------------------------------

    def device_arrays(self):
        """Arrays for the device scorer (all indexed by dense node index):

          tids         int64 [N]    sorted taxids
          index        dict tid->idx
          parent_idx   int32 [N]
          depth        int32 [N]    from the -e depth file (scoring depth)
          path_mat     int32 [N,D]  ancestor idx chain (parent..root), -1 pad
          euler_in/out int32 [N]    is_proper_ancestor(a, d):
                                    in[a] < in[d] and out[d] <= out[a] (a != d)
          rank_code    int8  [N]    0 other, 1 strain, 2 species
          species_anc  int32 [N]    first species-ranked ancestor (or -1)
        """
        tids, index, parent_idx, depth, path_mat = self.dense()
        n = len(tids)
        children: dict[int, list[int]] = {}
        root = None
        for i, t in enumerate(tids):
            p = int(parent_idx[i])
            if p == i:
                root = i
            else:
                children.setdefault(p, []).append(i)
        euler_in = np.zeros(n, np.int32)
        euler_out = np.zeros(n, np.int32)
        clock = 0
        stack = [(root, False)]
        while stack:
            node, done = stack.pop()
            if done:
                euler_out[node] = clock
                continue
            euler_in[node] = clock
            clock += 1
            stack.append((node, True))
            for ch in reversed(children.get(node, [])):
                stack.append((ch, False))
        rank_code = np.zeros(n, np.int8)
        for i, t in enumerate(tids):
            r = self.rank.get(int(t))
            if r == "strain":
                rank_code[i] = 1
            elif r == "species":
                rank_code[i] = 2
        species_anc = np.full(n, -1, np.int32)
        for i in range(n):
            for j in path_mat[i]:
                if j < 0:
                    break
                if rank_code[j] == 2:
                    species_anc[i] = j
                    break
        return {
            "tids": tids,
            "index": index,
            "parent_idx": parent_idx,
            "depth": depth,
            "path_mat": path_mat,
            "euler_in": euler_in,
            "euler_out": euler_out,
            "rank_code": rank_code,
            "species_anc": species_anc,
        }

    def dense(self):
        """Compact arrays: tids (sorted), tid->idx dict, parent_idx, depth,
        and a padded ancestor-path matrix (indices, -1 padded, excluding self).
        """
        tids = np.array(sorted(self.parent), dtype=np.int64)
        index = {int(t): i for i, t in enumerate(tids)}
        parent_idx = np.array([index[self.parent[int(t)]] for t in tids], np.int32)
        maxlen = 0
        paths = []
        for t in tids:
            p = self.path_to_root(int(t))
            paths.append(p)
            maxlen = max(maxlen, len(p))
        path_mat = np.full((len(tids), maxlen), -1, np.int32)
        for i, p in enumerate(paths):
            for j, a in enumerate(p):
                path_mat[i, j] = index[a]
        depth = np.array([self.depth.get(int(t), 0) for t in tids], np.int32)
        return tids, index, parent_idx, depth, path_mat
