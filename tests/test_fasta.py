"""FASTA/FASTQ reader semantics (kseq-equivalent, ref src/kseq.h).

kseq accepts both formats through one parser: '>' or '@' opens a
record, and after a FASTQ '+' separator it consumes quality bytes until
their count reaches the sequence length -- so quality lines starting
with '@' or '>' are data, not record boundaries.
"""

import gzip

from sigfish_tpu.io.fasta import read_fasta


def _write(tmp_path, text, name="x.fa"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_multiline_fasta(tmp_path):
    p = _write(tmp_path, ">c1 desc here\nACGT\nacgt\n\n>c2\nTTTT\n")
    assert list(read_fasta(p)) == [("c1", "ACGTacgt"), ("c2", "TTTT")]


def test_fastq_quality_skipped(tmp_path):
    # quality bytes must not leak into the sequence
    p = _write(tmp_path, "@r1\nACGTACGT\n+\nIIIIIIII\n@r2\nGGGG\n+r2\nJJJJ\n")
    assert list(read_fasta(p)) == [("r1", "ACGTACGT"), ("r2", "GGGG")]


def test_fastq_quality_starting_with_at_is_not_a_header(tmp_path):
    # '@' is a legal quality character (phred 31); kseq counts bytes, it
    # does not treat the line as a new record
    p = _write(tmp_path, "@r1\nACGT\n+\n@III\n@r2\nTT\n+\n@@\n")
    assert list(read_fasta(p)) == [("r1", "ACGT"), ("r2", "TT")]


def test_fastq_multiline_seq_and_quality(tmp_path):
    p = _write(tmp_path, "@r1\nACGT\nACGT\n+\nIIII\nIIII\n@r2\nCC\n+\nII\n")
    assert list(read_fasta(p)) == [("r1", "ACGTACGT"), ("r2", "CC")]


def test_gzip_transparent(tmp_path):
    p = tmp_path / "z.fa.gz"
    with gzip.open(p, "wt") as fp:
        fp.write(">c1\nACGT\n")
    assert list(read_fasta(str(p))) == [("c1", "ACGT")]
