"""Edge-case robustness: empty files, tiny reads, short contigs."""

import io

import numpy as np
import pytest

from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer
from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

REF = "/root/reference/test"


def _write(path, recs, hdr=None):
    with Slow5Writer(str(path), header_data=hdr or [{}]) as w:
        for r in recs:
            w.write_record(r)


def _rec(rid, sig):
    return Slow5Record(
        read_id=rid, read_group=0, digitisation=8192.0, offset=10.0,
        range=1400.0, sampling_rate=4000.0,
        raw_signal=np.asarray(sig, np.int16),
    )


def test_empty_blow5(tmp_path):
    p = tmp_path / "empty.blow5"
    _write(p, [])
    sf = Slow5File(str(p))
    assert sf.read_batch(10, 10**6) == []
    sf.close()
    opt = Options(query_size=32)
    core = Core(f"{REF}/nCoV-2019.reference.fasta", str(p), opt)
    out = io.StringIO()
    run_dtw(core, out)
    core.close()
    assert out.getvalue() == ""


def test_tiny_and_empty_reads_counted(tmp_path):
    rng = np.random.default_rng(0)
    src = Slow5File(f"{REF}/sp1_dna.blow5")
    real = next(iter(src))
    src.close()
    p = tmp_path / "mix.blow5"
    _write(p, [
        _rec("tiny", rng.integers(400, 600, 30)),     # too few events
        real,                                          # maps
        _rec("short2", rng.integers(400, 600, 400)),   # few events
    ])
    opt = Options(query_size=250)
    core = Core(f"{REF}/nCoV-2019.reference.fasta", str(p), opt)
    out = io.StringIO()
    run_dtw(core, out)
    lines = [l for l in out.getvalue().splitlines() if l]
    # the real read maps; degraded reads are counted, not crashed on
    assert any(l.startswith(real.read_id) for l in lines)
    assert core.ignored + core.too_short >= 1
    core.close()


def test_contig_shorter_than_k(tmp_path):
    fa = tmp_path / "mix.fa"
    # 4-base contig is shorter than the 6-mer => empty track, skipped;
    # the real-sized contig still maps
    import itertools
    seq = "".join(
        np.random.default_rng(1).choice(list("ACGT"), 2000)
    )
    fa.write_text(f">stub\nACGT\n>real\n{seq}\n")
    src = Slow5File(f"{REF}/sp1_dna.blow5")
    recs = list(src)
    src.close()
    p = tmp_path / "r.blow5"
    _write(p, recs[:2])
    opt = Options(query_size=64)
    core = Core(str(fa), str(p), opt)
    out = io.StringIO()
    run_dtw(core, out)
    core.close()
    lines = [l for l in out.getvalue().splitlines() if l]
    assert len(lines) == 2
    for l in lines:
        assert l.split("\t")[5] == "real"


def test_degenerate_rna_sam_map_does_not_crash(tmp_path):
    """RNA --sam with an alignment whose r2q map ends in a deletion.

    The C reference aborts on this state (assert at sigfish.c:669); we
    emit the SAM line with an empty ss tag (fuzz seed 1006 regression).
    """
    from sigfish_tpu.output import DegenerateAlignment, r2qevent_map_to_ss

    m = np.full((5, 2), -1, np.int32)
    m[1] = (0, 2)  # interior match, last kmer unmatched
    with pytest.raises(DegenerateAlignment):
        r2qevent_map_to_ss(m, 0, np.arange(10), np.ones(10, np.float32), True)

    # end-to-end: noise reads vs a tiny contig, RNA std-DTW SAM output
    rng = np.random.default_rng(1006)
    seq = "".join("ACGT"[b] for b in rng.integers(0, 4, 400))
    fa = tmp_path / "ref.fa"
    fa.write_text(f">c0\n{seq}\n")
    recs = [
        _rec(f"n{i}", rng.integers(300, 900, int(rng.integers(2000, 6000))))
        for i in range(6)
    ]
    p = tmp_path / "r.blow5"
    _write(p, recs, hdr=[{"experiment_type": "rna"}])
    opt = Options(query_size=50, prefix_size=-1, dtw_std=True, sam=True,
                  full_ref=True, rna=True)
    core = Core(str(fa), str(p), opt)
    out = io.StringIO()
    run_dtw(core, out)
    emitted = len([l for l in out.getvalue().splitlines()
                   if l and not l.startswith("@")])
    # every read either emitted or counted as ignored -- no crash
    # (too_short reads are still mapped via the clipped path, as in the
    # reference)
    assert emitted + core.ignored == 6
    assert emitted >= 4
    core.close()
