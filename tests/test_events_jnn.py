"""Event detection + jnn segmentation tests.

ref: events.c (scrappie t-test segmentation), jnn.c (adaptor/polyA).
Golden parity was established by byte-diffing the full pipeline against
the C reference binary (built with the same custom model via
--kmer-model); these tests lock in structural invariants.
"""

import numpy as np
import pytest

from sigfish_tpu.io.blow5 import Slow5File
from sigfish_tpu.ops.events import get_events
from sigfish_tpu.ops.jnn import detect_query_start, find_adaptor

DNA = "/root/reference/test/sp1_dna.blow5"
RNA = "/root/reference/test/sequin_rna.blow5"


@pytest.fixture(scope="module")
def dna_recs():
    sf = Slow5File(DNA)
    recs = list(sf)
    sf.close()
    return recs


@pytest.fixture(scope="module")
def rna_recs():
    sf = Slow5File(RNA)
    recs = list(sf)
    sf.close()
    return recs


def test_event_table_invariants_dna(dna_recs):
    for rec in dna_recs:
        et = get_events(rec.to_pa(), rna=False)
        assert et.n > 0
        # events ordered, non-overlapping, within the signal
        assert (np.diff(et.start) > 0).all()
        assert (et.length > 0).all()
        ends = et.start + et.length
        assert ends[-1] <= rec.len_raw_signal
        assert (et.start[1:] >= ends[:-1] - 1).all()
        # means are finite and pA-scaled
        assert np.isfinite(et.mean).all()


def test_event_counts_stable_dna(dna_recs):
    # locked-in counts from the C-parity run (any change to segmentation
    # params or numerics shows up here)
    counts = {r.read_id: get_events(r.to_pa(), rna=False).n for r in dna_recs}
    assert len(counts) == 5
    for n, rec in zip(counts.values(), dna_recs):
        # ~ 1 event per 10 samples for DNA
        assert 0.05 < n / rec.len_raw_signal < 0.25


def test_rna_event_params_coarser(rna_recs):
    # RNA windows (7,14) vs DNA (3,6): fewer events per sample
    rec = rna_recs[0]
    n_rna = get_events(rec.to_pa(), rna=True).n
    n_dna = get_events(rec.to_pa(), rna=False).n
    assert n_rna < n_dna


def test_detect_query_start_rna(rna_recs):
    # all 8 in-repo RNA test reads have detectable adaptor+polyA
    # (prefix_fail == 0 in the reference run)
    for rec in rna_recs:
        pa = rec.to_pa()
        et = get_events(pa, rna=True)
        qs = detect_query_start(rec.raw_signal, pa, et.start)
        assert qs > 0
        # polyA ends inside the read
        assert et.start[qs] < rec.len_raw_signal * 0.6


def test_find_adaptor_bounds(rna_recs):
    rec = rna_recs[0]
    ax, ay = find_adaptor(rec.raw_signal)
    assert 0 <= ax < ay <= rec.len_raw_signal


def test_prefix_sumsq_squares_in_f32():
    """The reference squares each sample with a FLOAT multiply before
    the double accumulation (events.c:303-305); squaring in f64 shifts
    event stdv through cancellation and can flip t-stat boundaries
    (fuzz seed 1090 regression)."""
    import numpy as np

    from sigfish_tpu.ops.events import compute_prefix_sums

    x = np.array([105.46875, 104.78516, 106.15234], dtype=np.float32)
    _, sumsqs = compute_prefix_sums(x)
    expected = np.cumsum([np.float64(np.float32(v * v)) for v in x])
    assert np.array_equal(sumsqs[1:], expected)
    # and it must NOT equal the f64-squared version for values whose
    # square is inexact in f32
    f64sq = np.cumsum(x.astype(np.float64) ** 2)
    assert not np.array_equal(sumsqs[1:], f64sq)


def test_prefix_events_safety_contract(rna_recs, dna_recs):
    """detect_events_prefix: the first n_safe events of a TRUNCATED
    signal must be bit-identical to the full-signal run (peak commits
    before the truncation-affected t-stat range depend only on exact
    values -- the basis of the pipeline's prefix-bounded eventization).
    Native and Python must agree on n_safe and the tables."""
    from sigfish_tpu.ops.events import (
        DNA_PARAMS,
        RNA_PARAMS,
        detect_events_prefix,
        get_events_prefix,
    )

    for recs, rna in ((dna_recs, False), (rna_recs[:3], True)):
        w2 = (RNA_PARAMS if rna else DNA_PARAMS)["window_length2"]
        for rec in recs:
            pa = rec.to_pa()
            full = get_events(pa, rna=rna)
            n = pa.size
            for S in (1500, n // 3, n // 2, n):
                if S > n:
                    continue
                lim = n if S == n else S - w2
                et, n_safe = get_events_prefix(pa[:S], rna, lim)
                et_py, n_safe_py = detect_events_prefix(pa[:S], rna, lim)
                assert n_safe == n_safe_py
                assert np.array_equal(et.start[:n_safe], et_py.start[:n_safe])
                assert np.array_equal(et.start[:n_safe], full.start[:n_safe])
                assert np.array_equal(et.length[:n_safe], full.length[:n_safe])
                assert np.array_equal(et.mean[:n_safe], full.mean[:n_safe])
                assert np.array_equal(et.stdv[:n_safe], full.stdv[:n_safe])
                if S == n:
                    assert n_safe == full.n  # whole signal exact
                else:
                    assert n_safe >= et.n - 8  # the bound is tight


def test_jnn_core_first_only_matches_full():
    """first_only early stop: segs[0] must equal the full scan's
    segs[0] (finality proof: merges need a run starting within
    seg_dist of segs[0].end), native == python fallback."""
    from sigfish_tpu import native
    from sigfish_tpu.ops import jnn as J

    rng = np.random.default_rng(11)
    p = J.JNNV1_R9_POLYA
    for t in range(120):
        n = int(rng.integers(60, 2500))
        sig = rng.normal(100, 30, n)
        param = J.JnnParam(
            std_scale=p.std_scale, corrector=p.corrector,
            seg_dist=int(rng.integers(20, 400)),
            window=int(rng.integers(5, 300)), stall_len=p.stall_len,
            error=int(rng.integers(1, 40)), top=120.0, bot=80.0,
        )
        segs_full = J.jnn_core(sig, param)
        segs_fo, fin = J.jnn_core(sig, param, first_only=True)
        if segs_full or segs_fo:
            assert segs_fo[0] == segs_full[0], t
        # python fallback agrees
        orig = native.jnn_core_segments
        native.jnn_core_segments = lambda *a, **k: None
        try:
            segs_py, fin_py = J.jnn_core(sig, param, first_only=True)
        finally:
            native.jnn_core_segments = orig
        assert (segs_fo, fin) == (segs_py, fin_py), t


def test_find_polya_bounded_matches_full_scan(rna_recs):
    """find_polya's growing-prefix scan must return the same segment as
    an unbounded jnn_core pass over the whole tail (ref jnn.c:354-376
    takes segs[0] of the full scan)."""
    from sigfish_tpu.ops import jnn as J

    for rec in rna_recs:
        pa = rec.to_pa()
        ax, ay = J.find_adaptor(rec.raw_signal)
        assert ay > 0
        m_a = float(np.mean(pa[ax:ay].astype(np.float32)))
        p = J.JNNV1_R9_POLYA
        param = J.JnnParam(
            std_scale=p.std_scale, corrector=p.corrector,
            seg_dist=p.seg_dist, window=p.window, stall_len=p.stall_len,
            error=p.error, top=m_a + 50, bot=m_a + 10,
        )
        segs_full = J.jnn_core(J._rm_outlier(pa[ay:]), param)
        got = J.find_polya(pa[ay:], m_a + 50, m_a + 10)
        want = tuple(segs_full[0]) if segs_full else (-1, -1)
        assert got == want


def test_prepare_read_prefix_equals_exact_path(rna_recs):
    """The pipeline's prefix-bounded fast path must produce an
    identical ReadWork (events used, window, flags, query) to the
    exact full-signal path, on real reads and on truncated/degraded
    ones (clip + prefix-fail fallbacks)."""
    from sigfish_tpu.io.blow5 import Slow5Record
    from sigfish_tpu.runtime import pipeline as P

    opt = P.Options(rna=True, query_size=500, prefix_size=-1, engine="scan")
    core = P.Core(
        "/root/reference/test/rnasequin_sequences_2.4.fa", RNA, opt
    )
    try:
        rng = np.random.default_rng(5)
        cases = []
        for rec in rna_recs:
            cases.append(rec)
            # truncated variants exercise clip/ignored/fallback paths
            for cut in (0.25, 0.6):
                sig = rec.raw_signal[: int(rec.len_raw_signal * cut)]
                cases.append(
                    Slow5Record(
                        read_id=rec.read_id + f"_c{cut}",
                        read_group=rec.read_group,
                        digitisation=rec.digitisation,
                        offset=rec.offset,
                        range=rec.range,
                        sampling_rate=rec.sampling_rate,
                        raw_signal=sig,
                    )
                )
        for rec in cases:
            w_fast = P.ReadWork()
            w_fast.rec = rec
            w_fast = P._prepare_read_prefix(core, w_fast)
            w_exact = P.ReadWork()
            w_exact.rec = rec
            w_exact = P._normalise_single(
                core, P._event_single(core, w_exact)
            )
            assert w_fast.skip == w_exact.skip, rec.read_id
            assert w_fast.flag_prefix_fail == w_exact.flag_prefix_fail
            assert w_fast.flag_ignored == w_exact.flag_ignored
            assert w_fast.flag_too_short == w_exact.flag_too_short
            if w_exact.skip:
                continue
            assert (w_fast.qstart, w_fast.qend) == (w_exact.qstart, w_exact.qend)
            assert np.array_equal(w_fast.query, w_exact.query), rec.read_id
            ne = w_fast.n_events
            assert np.array_equal(
                w_fast.event_start[:ne], w_exact.event_start[:ne]
            )
            assert np.array_equal(
                w_fast.event_length[:ne], w_exact.event_length[:ne]
            )
    finally:
        core.close()
