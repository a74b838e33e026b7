"""Native (C++) kernels vs Python oracles: bit-exact requirements."""

import numpy as np
import pytest

import sigfish_tpu.native as nat
from sigfish_tpu.ops.events import detect_events
from sigfish_tpu.ops.sdtw_ref import (
    std_dtw_cost as py_std,
    subsequence_cost as py_sub,
    subsequence_path as py_path,
)

pytestmark = pytest.mark.skipif(not nat.available(), reason="no native build")


def test_subsequence_bit_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(80).astype(np.float32)
    y = rng.standard_normal(333).astype(np.float32)
    np.testing.assert_array_equal(nat.subsequence_cost(x, y), np.asarray(py_sub(x, y)))


def test_std_dtw_bit_exact():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(60).astype(np.float32)
    y = rng.standard_normal(200).astype(np.float32)
    np.testing.assert_array_equal(nat.std_dtw_cost(x, y), np.asarray(py_std(x, y)))


def test_path_identical():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(50).astype(np.float32)
    y = rng.standard_normal(400).astype(np.float32)
    cost = np.asarray(py_sub(x, y))
    for starty in (10, 200, 399, int(cost[-1].argmin())):
        pxn, pyn = nat.subsequence_path(cost, starty)
        pxp, pyp = py_path(cost, starty)
        np.testing.assert_array_equal(pxn, pxp)
        np.testing.assert_array_equal(pyn, pyp)


def test_events_bit_exact_both_chemistries():
    from sigfish_tpu.io.blow5 import Slow5File

    for path, rna in (
        ("/root/reference/test/sp1_dna.blow5", False),
        ("/root/reference/test/sequin_rna.blow5", True),
    ):
        sf = Slow5File(path)
        for rec in sf:
            pa = rec.to_pa()
            et = detect_events(pa, rna=rna)
            st, ln, mn, sd = nat.detect_events(pa, rna=rna)
            np.testing.assert_array_equal(st, et.start)
            np.testing.assert_array_equal(ln, et.length)
            np.testing.assert_array_equal(mn, et.mean)
            np.testing.assert_array_equal(sd, et.stdv)
        sf.close()


def test_jnn_native_matches_python():
    from sigfish_tpu.io.blow5 import Slow5File
    from sigfish_tpu.ops import jnn as J
    from sigfish_tpu.ops.jnn import JnnParam, JNNV1_R9_POLYA

    rng = np.random.default_rng(3)
    sig = np.clip(rng.normal(90, 15, 30000), 0, 1200)
    sig[5000:9000] = rng.normal(60, 3, 4000)  # a low run
    p = JnnParam(std_scale=-1, corrector=50, seg_dist=200, window=250,
                 stall_len=1.0, error=30, top=70.0, bot=50.0)
    segs_nat = nat.jnn_core_segments(sig, p.top, p.bot, p.corrector,
                                     p.seg_dist, p.window, p.stall_len, p.error)
    # python fallback path
    orig = nat._lib
    try:
        nat._lib = None
        nat._build = lambda: False
        segs_py = J.jnn_core(sig, p)
    finally:
        nat._lib = orig
    assert [(int(a), int(b)) for a, b in segs_nat] == segs_py


def test_std_lastrow_exact_vs_scalar_oracle():
    """sf_std_lastrow (the --dtw-std CPU-engine scorer) must equal the
    exact scalar-order oracle bitwise, incl. degenerate shapes.
    ref: std_dtw cdtw.c:70-94; fuzz seeds 3003/3031."""
    from sigfish_tpu import native
    from sigfish_tpu.ops.sdtw_ref import std_dtw_cost

    if native.std_lastrow(np.ones(2, np.float32), np.ones(2, np.float32)) is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    for n, m in ((1, 7), (2, 1), (50, 400), (13, 13), (250, 1000)):
        q = rng.standard_normal(n).astype(np.float32)
        y = rng.standard_normal(m).astype(np.float32)
        row = native.std_lastrow(q, y)
        ex = np.asarray(std_dtw_cost(q, y))[-1]
        assert np.array_equal(row, ex), (n, m)


def test_subsequence_backtrack_dirs_vs_full_matrix():
    """The direction-code backtrack (subsequence_diag_dirs: 1-byte
    codes, no O(n*m) float matrix) must reproduce the C full-matrix
    path bit-for-bit -- including diag>left>up float-equality
    tie-breaks, stressed here with quantized values that force exact
    ties. Oracle = sf_subsequence (scalar row-major) + sf_path over
    the stored matrix."""
    from sigfish_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(23)
    for quantized in (False, True):
        for _ in range(120):
            n = int(rng.integers(2, 160))
            m = int(rng.integers(2, 400))
            if quantized:
                q = (rng.integers(0, 4, n) * 0.5).astype(np.float32)
                y = (rng.integers(0, 4, m) * 0.5).astype(np.float32)
            else:
                q = rng.standard_normal(n).astype(np.float32)
                y = rng.standard_normal(m).astype(np.float32)
            starty = int(rng.integers(0, m))
            px, py = native.subsequence_backtrack(q, y, starty, std=False)
            cost = native.subsequence_cost(q, y)
            ex_px, ex_py = native.subsequence_path(cost, starty)
            assert np.array_equal(px, ex_px), (n, m, starty, quantized)
            assert np.array_equal(py, ex_py), (n, m, starty, quantized)


def test_subsequence_backtrack_rejects_empty():
    """Empty query/window must raise, not corrupt the heap (the C
    kernels read x[0]/y[0] unconditionally; fuzz seed 31025)."""
    from sigfish_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    y = np.ones(4, np.float32)
    with pytest.raises(ValueError):
        native.subsequence_backtrack(np.empty(0, np.float32), y, 3, std=False)
    with pytest.raises(ValueError):
        native.subsequence_backtrack(y, np.empty(0, np.float32), 0, std=False)
