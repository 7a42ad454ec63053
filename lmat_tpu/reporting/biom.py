"""BIOM 1.0 (JSON) export — the Supplementary_Tools/BIOM capability:
convert per-sample fastsummary/.species tables into a BIOM observation
matrix for phyloseq/QIIME interoperability."""

from __future__ import annotations

import json
import time

from .multi_table import _parse_rows


def fastsummary_to_biom(samples: list[tuple[str, str]], out_path: str,
                        taxonomy=None, min_reads: int = 1):
    """samples: [(sample_name, summary_path)].  taxonomy (optional): a
    core.taxonomy.Taxonomy for lineage metadata."""
    names = [s[0] for s in samples]
    counts: dict[int, dict[str, int]] = {}
    orgname: dict[int, str] = {}
    for name, path in samples:
        for _avg, cnt, tid, nm in _parse_rows(path):
            if cnt >= min_reads:
                counts.setdefault(tid, {})[name] = cnt
                orgname.setdefault(tid, nm)
    tids = sorted(counts)
    rows = []
    for tid in tids:
        meta = {"taxonomy": None}
        if taxonomy is not None and tid in taxonomy:
            lineage = [
                taxonomy.names.get(t, str(t))
                for t in reversed(taxonomy.path_to_root(tid))
            ] + [taxonomy.names.get(tid, str(tid))]
            meta = {"taxonomy": lineage}
        else:
            meta = {"taxonomy": [orgname.get(tid, str(tid))]}
        rows.append({"id": str(tid), "metadata": meta})
    data = []
    for i, tid in enumerate(tids):
        for j, name in enumerate(names):
            c = counts[tid].get(name)
            if c:
                data.append([i, j, c])
    biom = {
        "id": None,
        "format": "Biological Observation Matrix 1.0.0",
        "format_url": "http://biom-format.org",
        "type": "OTU table",
        "generated_by": "lmat_tpu",
        "date": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "rows": rows,
        "columns": [{"id": n, "metadata": None} for n in names],
        "matrix_type": "sparse",
        "matrix_element_type": "int",
        "shape": [len(tids), len(names)],
        "data": data,
    }
    with open(out_path, "w") as f:
        json.dump(biom, f)
    return out_path
