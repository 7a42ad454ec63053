"""Structured reader/writer for read_label ``.out`` files.

The per-read line format is the framework's primary interchange surface
(SURVEY.md §6; reference writer: /root/reference/src/read_label.cpp:894-937,
reference reader: Supplementary_Tools/pyLMAT/LmatIO.py — a Biopython SeqIO
plugin).  This module gives the same capability without the Biopython
dependency: iterate records as dataclasses, round-trip them back to lines.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class OutRecord:
    """One classified read."""

    header: str
    seq: str                      # read bases, or "X" when -p printing is off
    log_avg: float = -1.0         # score statistics column
    stdev: float = -1.0
    valid_kmers: int = -1
    candidates: list = field(default_factory=list)  # [(taxid, score), ...]
    call_tid: int = -1
    call_score: float = -1.0
    match_type: str = ""          # DirectMatch/MultiMatch/.../ReadTooShort

    @property
    def classified(self) -> bool:
        return self.match_type.endswith("Match") and self.call_tid >= 0

    # the regular candidate walk prints " tid score" with a leading space
    # per pair (read_label.cpp:898-910); the phiX short-circuit prints its
    # single pair without one (:829-848) — preserved per record for byte
    # round-trips
    cand_leading_space: bool = True
    # reject-quirk prefix row: the reference emits only "hdr\tread\t" for
    # reads rejected inside construct_labels (read_label.cpp:727-733);
    # such records carry no scoring columns and round-trip as the bare
    # prefix (no fabricated stat/call columns)
    truncated: bool = False

    def to_line(self) -> str:
        """Reference-format tab-separated line (no trailing newline;
        truncated prefix rows keep their trailing tab)."""
        if self.truncated:
            return f"{self.header}\t{self.seq}\t"
        g = "%g".__mod__
        stats = f"{g(self.log_avg)} {g(self.stdev)} {self.valid_kmers}"
        cand = " ".join(f"{t} {g(s)}" for t, s in self.candidates)
        if self.candidates and self.cand_leading_space:
            cand = " " + cand
        call = f"{self.call_tid} {g(self.call_score)} {self.match_type}".rstrip()
        return "\t".join([self.header, self.seq, stats, cand, call])


def parse_out_line(line: str) -> OutRecord | None:
    """Parse one ``.out`` line; None for non-record lines.

    Handles the reference's failure rows ("-1 -1 -1\\t-1 -1\\t<n> <m>
    ReadTooShort|NoDbHits", read_label.cpp:1218-1271) and the reject quirk
    where a read's header/seq prefix is emitted without the remaining
    columns (read_label.cpp:727-733)."""
    parts = line.rstrip("\n").split("\t")
    if len(parts) < 2:
        return None
    rec = OutRecord(header=parts[0], seq=parts[1])
    if len(parts) < 5:
        rec.truncated = True
        return rec  # rejected-read prefix (no scoring columns)
    stats = parts[2].split()
    if len(stats) >= 3:
        rec.log_avg = float(stats[0])
        rec.stdev = float(stats[1])
        rec.valid_kmers = int(float(stats[2]))
    cand = parts[3].split()
    rec.candidates = [
        (int(cand[i]), float(cand[i + 1])) for i in range(0, len(cand) - 1, 2)
    ]
    rec.cand_leading_space = parts[3].startswith(" ")
    call = parts[4].split()
    if len(call) >= 3:
        # failure rows put ints in the first two slots and the category last
        try:
            rec.call_tid = int(call[0])
            rec.call_score = float(call[1])
        except ValueError:
            rec.call_tid, rec.call_score = -1, -1.0
        rec.match_type = call[2]
    return rec


def iter_out_records(path: str):
    """Yield OutRecord for every record line of a ``.out`` file."""
    with open(path) as f:
        for line in f:
            rec = parse_out_line(line)
            if rec is not None:
                yield rec


def write_out_records(records, path: str) -> int:
    """Write records back in reference format; returns the record count.
    Truncated prefix rows are written without a newline, matching the
    reference writer's reject quirk."""
    n = 0
    with open(path, "w") as f:
        for rec in records:
            line = rec.to_line()
            f.write(line if line.endswith("\t") else line + "\n")
            n += 1
    return n
