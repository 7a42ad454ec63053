"""Native C++ FASTA batcher vs the Python reader."""

import os

import numpy as np
import pytest

from lmat_tpu.io.fasta import iter_reads
from lmat_tpu.io.native_loader import NativeBatcher, native_available

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


@pytest.mark.skipif(not native_available(), reason="no C++ compiler")
def test_native_matches_python():
    expected = list(iter_reads(FIX + "/reads.fa"))
    got = []
    for batch, lengths, headers in NativeBatcher(FIX + "/reads.fa", 64, 512):
        for i, h in enumerate(headers):
            seq = bytes(batch[i][: lengths[i]]).decode()
            got.append((h, seq))
    assert len(got) == len(expected)
    for (h1, s1), (h2, s2) in zip(got, expected):
        assert h1 == h2 and s1 == s2


@pytest.mark.skipif(not native_available(), reason="no C++ compiler")
def test_native_fastq(tmp_path):
    p = tmp_path / "r.fq"
    p.write_text("@q1 x\nACGT\n+\nIIII\n@q2\nTTTTT\n+\nIIIII\n")
    got = []
    for batch, lengths, headers in NativeBatcher(str(p), 8, 16):
        for i, h in enumerate(headers):
            got.append((h, bytes(batch[i][: lengths[i]]).decode()))
    assert got == [("q1 x", "ACGT"), ("q2", "TTTTT")]
