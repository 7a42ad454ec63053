"""Database / runtime-input download (bin/get_db.sh equivalent).

Replicates the reference's catalog and retrieval conventions
(/root/reference/bin/get_db.sh:41-230): named legacy bundles with fixed part
lists, the generic ``dbinfo`` convention (first line ``<max_part>\t<cmprs>
\t<bytes>``; ``max_part == -1`` means single file), and the runtime-inputs
tarball.  Streams parts through gzip/lzma decompression, truncating at the
advertised byte size like the reference does.

Network access is attempted lazily via urllib; in offline environments
``fetch`` raises with a clear message and ``list_catalog`` still works.
"""

from __future__ import annotations

import gzip
import lzma
import os
import tarfile
import urllib.request

FTP_BASE = "ftp://gdo-bioinformatics.ucllnl.org/lmat"

# name -> (description, approx size). From get_db.sh's usage text and the
# LMAT doc DB tables (doc/lmat-doc.txt:456-487).
CATALOG = {
    "kML-18mer-small": ("Reduced microbial marker DB (18-mer, 16-bit)", "~4 GB"),
    "kML-18mer-medium": ("Microbial marker DB (18-mer, 16-bit)", "~17 GB"),
    "kML-18mer-large": ("Unpruned marker DB (18-mer, 16-bit)", "~55 GB"),
    "gene-20mer": ("Gene DB for gene name binning (20-mer)", "~20 GB"),
    "kFull-20mer": ("Full-sized DB for extensive read binning", "~400 GB"),
    "kML.v4-14.20.g10.db": ("Microbial marker database (20-mer, <=10 taxa/k-mer)", "~18 GB"),
    "kML+Human.v4-14.20.g10.db": ("Marker DB with explicit human tagging", "~18 GB"),
    "lmat-4-14.20mer.db": ("Fullsized 20-mer database", "~460 GB"),
    "lmat.genes.7-14.db": ("Gene database", "~20 GB"),
    "lmat-world-region.db": ("Human world-region binning DB", "~40 GB"),
}

# legacy fixed-part bundles: name -> (subdir, basename, parts, cmprs, out)
_LEGACY = {
    "kML-18mer-medium": (
        "18merML", "kML.18mer.16bit.db", ["a", "b", "c", "d", "e"], "gz",
        "kML.18mer.16bit.db",
    ),
    "kML-18mer-small": (
        "18merML", "kML.18mer.16bit.reduced.db", [""], "gz",
        "kML.18mer.16bit.reduced.db",
    ),
    "gene-20mer": (
        "GeneDB", "gene.20mer.db.a", ["a", "b", "c", "d", "e"], "gz",
        "gene.20mer.db",
    ),
    "kML-18mer-large": (
        "18merML", "kML.18mer.no_prune.16bit.part.", [str(i) for i in range(8)],
        "lzma", "kML.18mer.no_prune.16bit.db",
    ),
    "kFull-20mer": (
        "20merFullDB", "kFull.20mer.g1000.part.", [str(i) for i in range(20)],
        "lzma", "m9.20mer.16bit.g1000.db",
    ),
}


def list_catalog():
    return [(n, d, s) for n, (d, s) in CATALOG.items()]


def _open_url(url: str, timeout: float = 60.0):
    return urllib.request.urlopen(url, timeout=timeout)


def _stream_part(url: str, cmprs: str, out_f) -> int:
    """Append one decompressed part to out_f; returns bytes written."""
    opener = {"gz": gzip.open, "lzma": lzma.open}.get(cmprs)
    n = 0
    with _open_url(url) as resp:
        src = opener(resp) if opener else resp
        while True:
            chunk = src.read(1 << 20)
            if not chunk:
                break
            out_f.write(chunk)
            n += len(chunk)
    return n


def fetch_inputs(name: str, outdir: str) -> str:
    """Runtime-input tarball (get_db.sh:150-165): extract into outdir and
    return the directory to use as LMAT_DIR."""
    os.makedirs(outdir, exist_ok=True)
    url = f"{FTP_BASE}/runtime_inputs/{name}.tgz"
    with _open_url(url) as resp:
        with tarfile.open(fileobj=resp, mode="r|gz") as tf:
            # filter="data" rejects ../ and absolute member paths so a
            # MITM'd FTP server cannot write outside outdir.
            tf.extractall(outdir, filter="data")
    return os.path.abspath(outdir)


def fetch(name: str, outdir: str, progress=print) -> str:
    """Download a database by catalog name; returns the output path."""
    os.makedirs(outdir, exist_ok=True)
    if name in _LEGACY:
        subdir, base, parts, cmprs, outname = _LEGACY[name]
        out_path = os.path.join(outdir, outname)
        with open(out_path, "wb") as f:
            for i, suffix in enumerate(parts):
                if name == "gene-20mer":
                    url = f"{FTP_BASE}/{subdir}/{base}{suffix}.gz"
                elif name in ("kML-18mer-large", "kFull-20mer"):
                    url = f"{FTP_BASE}/{subdir}/{base}{suffix}.lzma"
                else:
                    sep = "." + suffix if suffix else ""
                    url = f"{FTP_BASE}/{subdir}/{base}{sep}.gz"
                _stream_part(url, cmprs, f)
                progress(f"part {i + 1} of {len(parts)} done")
        progress(f"Download complete. DB at {out_path}")
        return out_path

    # generic dbinfo convention (get_db.sh:167-227)
    with _open_url(f"{FTP_BASE}/{name}/dbinfo") as resp:
        mx_s, cmprs, mbytes_s = resp.read().decode().splitlines()[0].split("\t")[:3]
    mx, mbytes = int(mx_s), int(mbytes_s)
    out_path = os.path.join(outdir, name)
    with open(out_path, "wb") as f:
        if mx == -1:
            _stream_part(f"{FTP_BASE}/{name}/{name}.{cmprs}", cmprs, f)
        else:
            total = 0
            for suffix in range(mx + 1):
                total += _stream_part(
                    f"{FTP_BASE}/{name}/{name}.{suffix}.{cmprs}", cmprs, f
                )
                progress(f"part {suffix} of {mx} done")
                if total > mbytes:
                    f.truncate(mbytes)
                    break
    progress(f"Download complete. DB at {out_path}")
    return out_path
