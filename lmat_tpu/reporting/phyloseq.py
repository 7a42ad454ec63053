"""phyloseq input tables from per-sample ``.species`` reports.

The reference ships this as an R step
(/root/reference/Supplementary_Tools/BIOM/BIOM.{sh,R} + g.pl): concatenate
every sample's ``.species`` file with the sample id prepended, then emit the
three matrices phyloseq consumes — OTU read counts (taxid x sample), the
same matrix as per-sample relative abundance, and a taxonomy matrix.

Implementation note: BIOM.R:119 calls ``create_BIOM(spfile, 6, 1, 5)``,
which on the shipped ``concatenated.file`` layout (sample, avg, total,
count, taxid, name, ...) keys OTUs by the NAME column and fills the matrix
with the TAXID column as if it were a read count — an indexing slip in the
reference.  This port keys OTUs by taxid and fills read counts, which is
what the accompanying LMAT-BIOM_example.Rmd describes the tables to be;
the genus/species name handling of ``create_TAX`` (strip the "species,"
prefix, drop brackets, genus = first word) is preserved.
"""

from __future__ import annotations

import os


def concat_species(samples: list[tuple[str, str]]):
    """g.pl equivalent: [(sample_id, species_path)] -> rows of
    (sample_id, fields...) with each file's header line skipped."""
    rows = []
    for sid, path in samples:
        with open(path) as f:
            first = True
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                if first:
                    first = False
                    if not line.split("\t")[0].replace(".", "").isdigit():
                        continue  # header line (g.pl's `<P>;` skip)
                rows.append((sid,) + tuple(line.split("\t")))
    return rows


def _clean_species_name(name: str) -> str:
    """create_TAX name cleanup (BIOM.R:60-86): strip a "species," prefix,
    drop the first '[' and ']', genus = first word of the result."""
    if "species," in name:
        name = name[8:]
    name = name.replace("[", "", 1).replace("]", "", 1)
    return name


def phyloseq_tables(samples: list[tuple[str, str]], out_base: str,
                    threshold: float = 0.0, taxonomy=None,
                    drop_tids=(32630,)):
    """Write ``<out_base>.otu_reads.tsv``, ``.otu_ra.tsv`` and
    ``.tax_table.tsv`` from per-sample ``.species`` reports.

    samples: [(sample_id, species_path)].  threshold: minimum read count
    (BIOM.R:115 filters column 3).  drop_tids: taxids removed up front
    (BIOM.R:104 removes synthetic-construct 32630).  taxonomy (optional,
    core.taxonomy.Taxonomy): adds full-lineage rank columns the way the
    reference's Tax_Ref join (BIOM.R:128-139) does; without it the
    genus/species columns come from the report names (create_TAX)."""
    rows = concat_species(samples)
    names = []
    for sid, _ in samples:
        if sid not in names:
            names.append(sid)
    counts: dict[int, dict[str, int]] = {}
    spname: dict[int, str] = {}
    for r in rows:
        # (sample, avg, total, count, taxid, name[, strain...])
        if len(r) < 6:
            continue
        sid, cnt, tid, name = r[0], r[3], r[4], r[5]
        try:
            tid = int(tid)
            cnt = int(float(cnt))
        except ValueError:
            continue
        if tid in drop_tids or cnt < threshold:
            continue
        counts.setdefault(tid, {})[sid] = counts.get(tid, {}).get(sid, 0) + cnt
        spname.setdefault(tid, name)
    tids = sorted(counts)

    otu_path = out_base + ".otu_reads.tsv"
    with open(otu_path, "w") as f:
        f.write("TAXID\t" + "\t".join(names) + "\n")
        for tid in tids:
            f.write(str(tid) + "\t"
                    + "\t".join(str(counts[tid].get(n, 0)) for n in names)
                    + "\n")

    tot = {n: sum(counts[t].get(n, 0) for t in tids) for n in names}
    ra_path = out_base + ".otu_ra.tsv"
    with open(ra_path, "w") as f:
        f.write("TAXID\t" + "\t".join(names) + "\n")
        for tid in tids:
            f.write(str(tid) + "\t" + "\t".join(
                "%.10g" % (counts[tid].get(n, 0) / tot[n] if tot[n] else 0.0)
                for n in names) + "\n")

    tax_path = out_base + ".tax_table.tsv"
    ranks = ("superkingdom", "kingdom", "phylum", "class", "order", "family",
             "genus", "species")
    with open(tax_path, "w") as f:
        if taxonomy is not None:
            f.write("TAXID\t" + "\t".join(r.capitalize() for r in ranks) + "\n")
            for tid in tids:
                byrank = {}
                if tid in taxonomy:
                    for t in [tid] + list(taxonomy.path_to_root(tid)):
                        rk = taxonomy.rank.get(t, "")
                        if rk in ranks and rk not in byrank:
                            byrank[rk] = taxonomy.names.get(t, str(t))
                f.write(str(tid) + "\t"
                        + "\t".join(byrank.get(r, "NA") for r in ranks) + "\n")
        else:
            f.write("TAXID\tgenus\tspecie\n")
            for tid in tids:
                sp = _clean_species_name(spname.get(tid, str(tid)))
                genus = sp.split(" ")[0] if sp else "NA"
                f.write(f"{tid}\t{genus}\t{sp}\n")
    return otu_path, ra_path, tax_path


def species_file_samples(paths: list[str]):
    """BIOM.sh preamble: derive sample ids from the filenames (g.pl pulls
    the run id out of `fc.<RUN>_M_001.fasta...` names; other names fall
    back to the basename before the first '.')."""
    import re

    out = []
    for p in paths:
        b = os.path.basename(p)
        m = re.search(r"fc\.(.*?)_M_001\.fasta", b)
        out.append((m.group(1) if m else b.split(".")[0], p))
    return out
