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


def pull_headers(out_file: str, id_file: str, thresh: float, min_kmer: int,
                 odir: str):
    """Emit the bare read headers of selected reads, one per line, into
    per-group ``<out>.<idfile>.pulled.<main_tid>`` files.

    This is the `pull_headers.pl` step of the FASTQ retrieval pipeline
    (/root/reference/bin/pull_reads_fq_mc.sh:10,:97 — the script the wrapper
    invokes but the reference never shipped); selection semantics match
    pull_reads.pl:83-95, output is just the original header so the merged
    list can key FASTQ records (whose @lines carry the original header, not
    the FASTA-augmented one)."""
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

    from ..io.outfile import iter_out_records

    cnt = 0
    for rec in iter_out_records(out_file):
        if rec.truncated or not rec.match_type:
            continue
        tid = str(rec.call_tid)
        fh = None
        if (
            tid in valid and rec.call_score >= thresh
            and rec.valid_kmers >= min_kmer and rec.seq != "X"
        ):
            fh = handles[valid[tid]]
        elif (do_low and rec.call_score < low_min
              and rec.valid_kmers >= min_kmer and rec.seq != "X"):
            fh = handles["LowScore"]
        elif (rec.match_type == "NoDbHits" and rec.valid_kmers >= min_kmer
              and rec.seq != "X"):
            fh = handles.get("NoDbHits")
        elif rec.match_type == "ReadTooShort" and do_short and rec.seq != "X":
            fh = handles.get("ReadTooShort")
        if fh is not None:
            cnt += 1
            fh.write(rec.header + "\n")
    for fh in handles.values():
        fh.close()
    return cnt


def pull_reads_fq(headers_file: str, fq_file: str, ofile: str) -> int:
    """Extract FASTQ records (with qualities) whose header appears in
    ``headers_file`` — `pull_reads_fq.pl` equivalent
    (/root/reference/bin/pull_reads_fq.pl:1-37).

    Reference semantics replicated exactly: EVERY line starting with '@' is
    treated as a header line and tested against the set (so a quality line
    that begins with '@' and is not a selected header stops printing — the
    reference behaves the same way); all following non-'@' lines of a
    selected record are printed."""
    with open(headers_file) as f:
        sh = {line.rstrip("\n") for line in f}
    n = 0
    do_prn = False
    with open(fq_file) as f, open(ofile, "w") as out:
        for raw in f:
            line = raw.rstrip("\n")
            if line.startswith("@"):
                if line[1:] in sh:
                    do_prn = True
                    n += 1
                    out.write(line + "\n")
                else:
                    do_prn = False
            elif do_prn:
                out.write(line + "\n")
    return n


def pull_reads_fq_pipeline(out_files: list[str], id_file: str, fq_file: str,
                           thresh: float, min_kmer: int, odir: str) -> str:
    """The full FASTQ retrieval flow of pull_reads_fq_mc.sh:90-128: headers
    per (.out file, id group) -> merged per-group ``.headers`` list (the
    wrapper's filename shortening included) -> one ``.fastq`` of the
    original records.  Returns the merged fastq path of the last group."""
    import re

    for f in out_files:
        pull_headers(f, id_file, thresh, min_kmer, odir)
    idname = os.path.basename(id_file)
    last = ""
    with open(id_file) as f:
        groups = [ln.split()[0] for ln in f if ln.strip()]
    for taxid in groups:
        merge_path = None
        parts = []
        for out_file in out_files:
            bname = os.path.basename(out_file)
            ofile = os.path.join(odir, f"{bname}.{idname}.pulled.{taxid}")
            if not os.path.exists(ofile):
                continue
            if merge_path is None:
                # the wrapper shortens "…lo.rl_outputN.out." and "pulled."
                # out of the merged name (pull_reads_fq_mc.sh:104-107) —
                # applied to the BASENAME only, dots escaped, first match
                # only (the wrapper's unescaped global seds would also
                # rewrite a directory component that happens to match)
                d, b = os.path.split(ofile)
                b = re.sub(r"lo\.rl_output[0-9]+\.out\.", "", b, count=1)
                b = re.sub(r"pulled\.", "", b, count=1)
                merge_path = os.path.join(d, b) + ".headers"
            parts.append(ofile)
        if merge_path is None:
            continue
        with open(merge_path, "w") as out:
            for p in parts:
                with open(p) as src:
                    out.write(src.read())
                os.remove(p)
        # suffix swap only (the wrapper's `sed 's/headers/fastq/'` would
        # also rewrite a directory component that contains "headers")
        fq_out = merge_path[: -len("headers")] + "fastq"
        pull_reads_fq(merge_path, fq_file, fq_out)
        last = fq_out
    return last
