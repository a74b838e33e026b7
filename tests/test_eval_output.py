"""eval subtool + PAF/SAM formatting tests. ref: eval.c, sigfish.c:628-826."""

import io

import numpy as np

from sigfish_tpu.eval import (
    eval_main,
    is_correct_overlap,
    parse_paf_rec,
)
from sigfish_tpu.output import _c_round, _fmt_f2, paf_line


def test_parse_paf_rec():
    line = "r1\t100\t5\t95\t+\tc1\t2000\t50\t140\t80\t90\t60\ttp:A:P\td1:f:10.00\td2:f:12.00\n"
    r = parse_paf_rec(line)
    assert r.rid == "r1" and r.tid == "c1"
    assert r.query_start == 5 and r.target_start == 50 and r.mapq == 60
    assert r.tp == "P"


def test_is_correct_overlap_threshold_100():
    # correct iff same tid+strand and min(|dst|,|dend|) < 100 (eval.c:219-242)
    a = parse_paf_rec("r\t10\t0\t9\t+\tc\t100\t500\t600\t1\t1\t60\ttp:A:P\n")
    b_ok = parse_paf_rec("r\t10\t0\t9\t+\tc\t100\t599\t700\t1\t1\t60\ttp:A:P\n")
    b_bad = parse_paf_rec("r\t10\t0\t9\t+\tc\t100\t600\t701\t1\t1\t60\ttp:A:P\n")
    b_strand = parse_paf_rec("r\t10\t0\t9\t-\tc\t100\t500\t600\t1\t1\t60\ttp:A:P\n")
    assert is_correct_overlap(a, b_ok)
    assert not is_correct_overlap(a, b_bad)
    assert not is_correct_overlap(a, b_strand)
    assert is_correct_overlap(a, b_bad, tid_only=True)


def test_eval_main_counts(tmp_path):
    truth = tmp_path / "truth.paf"
    test = tmp_path / "test.paf"
    truth.write_text(
        "r1\t10\t0\t9\t+\tc\t100\t50\t90\t1\t1\t60\ttp:A:P\n"
        "r2\t10\t0\t9\t+\tc\t100\t10\t30\t1\t1\t60\ttp:A:P\n"
    )
    test.write_text(
        "r1\t10\t0\t9\t+\tc\t100\t55\t95\t1\t1\t60\ttp:A:P\n"  # correct
        "r2\t10\t0\t9\t-\tc\t100\t10\t30\t1\t1\t13\ttp:A:P\n"  # wrong strand
        "r3\t10\t0\t9\t+\tc\t100\t10\t30\t1\t1\t5\ttp:A:P\n"   # not in truth
    )
    out = io.StringIO()
    stat = eval_main(str(truth), str(test), out=out)
    assert stat.truth_mapped == 2
    assert stat.correct == 1
    assert stat.incorrect == 1
    assert stat.only_in_b == 1
    text = out.getvalue()
    assert "mapped_truthset\t2" in text
    assert "#mapq\tcorrect\tincorrect" in text


def test_c_round_and_fmt():
    assert _c_round(0.5) == 1
    assert _c_round(1.5) == 2  # C roundf: away from zero
    assert _c_round(-0.5) == -1
    assert _fmt_f2(84.805) in ("84.80", "84.81")
    assert _fmt_f2(float("inf")) == "inf"


def test_paf_line_format():
    line = paf_line(
        "rid", 4365, 290, 1560, "-", "MN908947.3", 29903, 26471, 26632,
        84.81, 89.59, 28, 106,
    )
    f = line.rstrip("\n").split("\t")
    assert f[0] == "rid"
    assert f[4] == "-"
    assert f[11] == "28"
    assert f[12] == "tp:A:P"
    assert f[13] == "d1:f:84.81"
    assert f[14] == "d2:f:89.59"


def test_paf_line_degenerate_query_size():
    """query_size == 0 (qlen==1 reads, sigfish.c:807): the reference
    computes residue in f32 -> inf/nan and (int)round() wraps to
    INT_MIN via the x86 cast; must not raise (fuzz seed 12029)."""
    line = paf_line(
        "r", 227, 0, 27, "+", "c1", 2180, 749, 760, 5.0, float("inf"), 0, 0,
    )
    f = line.rstrip("\n").split("\t")
    assert f[9] == "-2147483648"  # residue: -inf wrapped
    assert f[10] == "11"
    # block_len == 0 too: residue is nan, same wrap
    line = paf_line(
        "r", 227, 0, 27, "+", "c1", 2180, 749, 749, float("nan"),
        float("nan"), 0, 0,
    )
    assert line.split("\t")[9] == "-2147483648"


def test_eval_atoi_tolerant_parsing(tmp_path):
    """C atoi semantics (parse_paf_rec eval.c:80-152): float coordinates
    and trailing junk are truncated to their digit prefix, not errors."""
    from sigfish_tpu.eval import eval_main, parse_paf_rec

    line = "r1\t100.7\t5junk\t20\t+\tctg\t1000\t50.5\t90xx\t10\t40\t60\ttp:A:P"
    rec = parse_paf_rec(line)
    assert (rec.qlen, rec.query_start, rec.query_end) == (100, 5, 20)
    assert (rec.target_start, rec.target_end, rec.mapq) == (50, 90, 60)

    truth = tmp_path / "t.paf"
    test = tmp_path / "b.paf"
    truth.write_text("r1\t100\t5\t20\t+\tctg\t1000\t50\t90\t10\t40\t60\ttp:A:P\n")
    test.write_text(line + "\n")
    import io

    out = io.StringIO()
    stat = eval_main(str(truth), str(test), out=out)
    assert stat.correct == 1 and stat.incorrect == 0


def test_eval_strtok_collapses_empty_fields():
    """strtok(.., "\\t\\r\\n") skips runs of delimiters -- double tabs must
    not shift the column mapping the way str.split would."""
    from sigfish_tpu.eval import parse_paf_rec

    line = "r1\t\t100\t5\t20\t+\tctg\t1000\t50\t90\t10\t40\t60"
    rec = parse_paf_rec(line)
    assert rec.qlen == 100 and rec.mapq == 60
