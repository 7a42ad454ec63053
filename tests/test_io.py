import numpy as np

from lmat_tpu.io.cppfmt import fmt_float
from lmat_tpu.io.fasta import iter_reads, iter_reads_lmat


def test_fasta_lmat_multiline(tmp_path):
    p = tmp_path / "r.fa"
    p.write_text(">r1 desc\nACGT\nACGT\n>r2\nTTTT\n")
    reads = list(iter_reads_lmat(str(p)))
    assert reads == [("r1 desc", "ACGTACGT"), ("r2", "TTTT")]


def test_fasta_lmat_single_char_line_dropped(tmp_path):
    # reference only appends sequence lines with length > 1
    p = tmp_path / "r.fa"
    p.write_text(">r1\nACGT\nA\nGGGG\n")
    reads = list(iter_reads_lmat(str(p)))
    assert reads == [("r1", "ACGTGGGG")]


def test_fastq_lmat_header_offset(tmp_path):
    # the reference pairs fastq reads with the previous record's header
    p = tmp_path / "r.fq"
    p.write_text("@q1\nACGT\n+\nIIII\n@q2\nTTTT\n+\nIIII\n")
    reads = list(iter_reads_lmat(str(p), fastq=True))
    assert reads == [("", "ACGT"), ("q1", "TTTT")]


def test_iter_reads_plain(tmp_path):
    p = tmp_path / "r.fq"
    p.write_text("@q1\nACGT\n+\nIIII\n")
    assert list(iter_reads(str(p))) == [("q1", "ACGT")]


def test_cpp_float_format():
    assert fmt_float(np.float32(1.0)) == "1"
    assert fmt_float(np.float32(0.5)) == "0.5"
    assert fmt_float(np.float32(-1)) == "-1"
    assert fmt_float(np.float32(2.317529)) == "2.31753"
    assert fmt_float(np.float32(1e-7)) == "1e-07"
    assert fmt_float(np.float32(123456789.0)) == "1.23457e+08"
