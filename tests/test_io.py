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


def test_out_record_parse_roundtrip():
    """Structured .out reader (the LmatIO.py capability): parse the golden
    file, classify flags, and line round-trip for fully-formed records."""
    import os

    from lmat_tpu.io.outfile import iter_out_records, parse_out_line

    W = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small",
                     "work")
    path = W + "/rl_nonull0.out"
    recs = list(iter_out_records(path))
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f]
    assert len(recs) == len(lines) == 400
    n_called = 0
    for rec, line in zip(recs, lines):
        assert rec.header and rec.seq
        if rec.classified:
            n_called += 1
            assert rec.call_tid > 0 and rec.match_type.endswith("Match")
            assert rec.valid_kmers >= 0
        # full records round-trip byte-identically
        if len(line.split("\t")) >= 5:
            assert rec.to_line() == line, line
    assert 0 < n_called < 400
    # failure-row flavors
    r = parse_out_line("h\tACGT\t-1 -1 -1\t-1 -1\t12 20 ReadTooShort")
    assert not r.classified and r.match_type == "ReadTooShort"
    r2 = parse_out_line("h\tACGT\t")
    assert r2 is not None and r2.match_type == "" and r2.truncated
    # reject-quirk prefix rows round-trip as the bare prefix (no fabricated
    # stat/call columns) and are written without a newline
    assert r2.to_line() == "h\tACGT\t"
