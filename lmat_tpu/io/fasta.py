"""FASTA/FASTQ readers.

``iter_reads_lmat`` replicates the reference read_label input loop
(/root/reference/src/read_label.cpp:1651-1711) byte-for-byte so classified
output is comparable:

* FASTA: every line starting with '>' is a header; sequence lines are
  accumulated **only if longer than one character** (the reference tests
  ``line.length() > 1``); a read is emitted at the next header or EOF.
* FASTQ: '@' starts a header, a '+' or '-' line terminates the read and the
  following quality line is skipped.  The reference pairs each FASTQ read with
  the *previous* record's header (the first read gets an empty header, later
  rendered "unknown_hdr:N"); we reproduce that quirk for parity.
* Empty headers are substituted with ``unknown_hdr:<running read count>``
  at consumption time (read_label.cpp:1728-1732).

``iter_reads`` is the sane general-purpose reader for the data pipeline.
"""

from __future__ import annotations

from typing import Iterator, Tuple


def iter_reads_lmat(path: str, fastq: bool = False) -> Iterator[Tuple[str, str]]:
    """Yield (header, sequence) exactly as the reference enqueues them."""
    hdr_buff = ""
    last_hdr_buff = ""
    read_buff = ""
    with open(path) as f:
        skip_next = False
        for raw in f:
            if skip_next:  # FASTQ quality line
                skip_next = False
                continue
            line = raw.rstrip("\n")
            c0 = line[0] if line else "\0"
            if c0 == ">" or (fastq and c0 == "@"):
                last_hdr_buff = hdr_buff
                hdr_buff = line[1:]
            if not fastq and c0 != ">" and len(line) > 1:
                read_buff += line
                line = ""
                c0 = "\0"
            if fastq and c0 not in ("@", "+", "-"):
                read_buff += line
                line = ""
                c0 = "\0"
            if (c0 == ">" or (fastq and c0 in ("+", "-"))) and read_buff:
                yield last_hdr_buff, read_buff
                read_buff = ""
                if fastq:
                    skip_next = True
        if read_buff:
            yield hdr_buff, read_buff


def iter_reads(path: str) -> Iterator[Tuple[str, str]]:
    """Plain multi-line FASTA/FASTQ reader (auto-detected), no quirks."""
    with open(path) as f:
        first = f.read(1)
    if first == "@":
        with open(path) as f:
            while True:
                h = f.readline()
                if not h:
                    return
                seq = f.readline().strip()
                f.readline()
                f.readline()
                yield h[1:].strip(), seq
    else:
        hdr, chunks = None, []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith(">"):
                    if hdr is not None:
                        yield hdr, "".join(chunks)
                    hdr, chunks = line[1:], []
                elif line:
                    chunks.append(line)
            if hdr is not None:
                yield hdr, "".join(chunks)
