"""Round-robin FASTA splitter (partition_fasta equivalent,
/root/reference/src/partition_fasta.cpp:93-103) for load balancing across
hosts/processes."""

from __future__ import annotations

from ..io.fasta import iter_reads


def partition_fasta(path: str, n_parts: int, out_base: str):
    outs = [open(f"{out_base}.{i}", "w") for i in range(n_parts)]
    n = 0
    for i, (hdr, seq) in enumerate(iter_reads(path)):
        f = outs[i % n_parts]
        f.write(f">{hdr}\n{seq}\n")
        n += 1
    for f in outs:
        f.close()
    return n
