"""Extract reads by taxid from classified .out files (pull_reads.pl
equivalent).  The id file lists groups: each line "main_tid [alias_tids...]",
or the special lines "LowScore <min_score>" / "ReadTooShort"; matching reads
are written as 80-column FASTA per group."""

from __future__ import annotations

import os


def pull_reads(out_file: str, id_file: str, thresh: float, min_kmer: int,
               odir: str):
    tbase = os.path.basename(out_file)
    idname = os.path.basename(id_file)
    ofilebase = os.path.join(odir, f"{tbase}.{idname}.pulled")

    valid: dict[str, str] = {}
    handles: dict[str, object] = {}
    do_low = do_short = False
    low_min = 0.0
    with open(id_file) as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            vals = line.split()
            if vals[0] == "LowScore":
                do_low = True
                low_min = float(vals[1]) if len(vals) > 1 else 0.0
                handles["LowScore"] = open(f"{ofilebase}.LowScore", "w")
            elif vals[0] == "ReadTooShort":
                do_short = True
                handles["ReadTooShort"] = open(f"{ofilebase}.ReadTooShort", "w")
            else:
                main_id = vals[0]
                for v in vals:
                    valid[v] = main_id
                handles[main_id] = open(f"{ofilebase}.{main_id}", "w")

    def write_fasta(fh, header, read):
        fh.write(f">{header}\n")
        for i in range(0, len(read), 80):
            fh.write(read[i : i + 80] + "\n")

    cnt = 0
    with open(out_file) as f:
        for raw in f:
            vals = raw.rstrip("\n").split("\t")
            if len(vals) < 5:
                continue
            call = vals[4].split(" ")
            if len(call) < 3:
                continue
            tid, score, mtype = call[0], float(call[1]), call[2]
            stats = vals[2].split(" ")
            valid_kmers = float(stats[2]) if len(stats) >= 3 else -1
            hdr = (
                f"{vals[0]};tid={tid};score={call[1]};mtype={mtype};"
                f"valid_kmers={stats[2] if len(stats) >= 3 else -1};uid={cnt};src={tbase}"
            )
            fh = None
            if (
                tid in valid and score >= thresh and valid_kmers >= min_kmer
                and vals[1] != "X"
            ):
                fh = handles[valid[tid]]
            elif do_low and score < low_min and valid_kmers >= min_kmer and vals[1] != "X":
                fh = handles["LowScore"]
            elif mtype == "NoDbHits" and valid_kmers >= min_kmer and vals[1] != "X":
                fh = handles.get("NoDbHits")
            elif mtype == "ReadTooShort" and do_short and vals[1] != "X":
                fh = handles.get("ReadTooShort")
            if fh is not None:
                cnt += 1
                write_fasta(fh, hdr, vals[1])
    for fh in handles.values():
        fh.close()
    return cnt
