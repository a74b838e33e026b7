"""Synthetic-signal validation of the 9-mer chemistries (R10 DNA,
RNA004 direct RNA).

The upstream builtin tables (ref src/model.c:140-169) are a stripped
blob in this environment, so the repo ships derived tables
(models/derive_models.py). This harness validates the full chemistry
plumbing end-to-end at 262,144-row scale: simulate raw signals from the
9-mer tables (levels + dwell + Gaussian noise, ADC-quantized), write a
real BLOW5 via Slow5Writer, map it with the production pipeline, and
assert the planted positions are recovered (same correctness criterion
as the eval subtool: tid+strand equal and min(|dst|,|dend|) < 100,
ref eval.c:219-242).
"""

from __future__ import annotations

import numpy as np
import pytest

from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer
from sigfish_tpu.models.genref import kmer_ranks, reverse_complement, _seq_bytes
from sigfish_tpu.models.pore_model import (
    MODEL_ID_DNA_R10,
    MODEL_ID_RNA_RNA004,
    load_builtin_model,
)
from sigfish_tpu.runtime.pipeline import Core, Options, process_batch

DIGITISATION = 8192.0
RANGE = 1400.0
OFFSET = 10.0
RATE = 4000.0


def _random_seq(rng, n):
    return "".join("ACGT"[b] for b in rng.integers(0, 4, n))


def _signal_from_levels(levels, rng, dwell=12, noise_sd=1.5):
    """Levels (pA) -> dwell-expanded noisy samples -> ADC int16."""
    dwells = rng.integers(dwell - 3, dwell + 4, size=levels.size)
    pa = np.repeat(levels, dwells).astype(np.float64)
    pa += rng.normal(0.0, noise_sd, pa.size)
    raw = np.rint(pa * DIGITISATION / RANGE - OFFSET)
    return np.clip(raw, -32000, 32000).astype(np.int16)


def _mkrec(rid, sig):
    return Slow5Record(
        read_id=rid, read_group=0, digitisation=DIGITISATION, offset=OFFSET,
        range=RANGE, sampling_rate=RATE, raw_signal=sig,
    )


def _walk_levels(seq, start, n_events, model):
    """Event levels of the k-mer walk seq[start : start+n_events+k-1]."""
    k = model.kmer_size
    sub = seq[start : start + n_events + k - 1]
    ranks = kmer_ranks(_seq_bytes(sub), k, warn_non_acgt=False)
    return model.level_mean[ranks]


def _correct(line, truth):
    f = line.split("\t")
    tid, strand = f[5], f[4]
    st, end = int(f[7]), int(f[8])
    t_tid, t_strand, t_st, t_end = truth
    if tid != t_tid or strand != t_strand:
        return False
    return min(abs(st - t_st), abs(end - t_end)) < 100


def _map_and_score(fa_path, bl_path, truths, opt):
    core = Core(fa_path, bl_path, opt)
    sf = Slow5File(bl_path)
    n_total = 0
    ok = 0
    blobs = core.sf.read_batch(512, 10**9)
    lines, _ = process_batch(core, blobs)
    for line in lines:
        if line is None:
            continue
        rid = line.split("\t", 1)[0]
        n_total += 1
        if _correct(line, truths[rid]):
            ok += 1
    core.close()
    sf.close()
    return ok, n_total, len(truths)


def test_r10_dna_synthetic(tmp_path):
    model = load_builtin_model(MODEL_ID_DNA_R10)
    assert model.kmer_size == 9 and model.num_kmer == 262144
    rng = np.random.default_rng(1234)
    L = 12000
    seq = _random_seq(rng, L)
    fa = tmp_path / "r10.fa"
    fa.write_text(f">ctg\n{seq}\n")
    rc = reverse_complement(seq)

    n_events = 300  # prefix 0 + q 250 + margin
    q = 250
    truths = {}
    bl = str(tmp_path / "r10.blow5")
    with Slow5Writer(bl, header_data=[{"experiment_type": "genomic_dna"}]) as w:
        for i in range(30):
            start = int(rng.integers(0, L - n_events - 9))
            if i % 2 == 0:
                levels = _walk_levels(seq, start, n_events, model)
                # mapped slice = events [0, q) -> bases [start, start+q)
                truths[f"r{i}"] = ("ctg", "+", start, start + q)
            else:
                levels = _walk_levels(rc, start, n_events, model)
                # '-' strand: pos = rlen - pos_rc (sigfish.c:971-972);
                # track length = L+1-k
                rlen = L + 1 - 9
                truths[f"r{i}"] = ("ctg", "-", rlen - (start + q), rlen - start)
            w.write_record(_mkrec(f"r{i}", _signal_from_levels(levels, rng)))

    opt = Options(pore="r10", prefix_size=0, query_size=q, engine="native")
    ok, n_mapped, n_reads = _map_and_score(str(fa), bl, truths, opt)
    assert n_mapped == n_reads, f"only {n_mapped}/{n_reads} mapped"
    assert ok / n_reads >= 0.85, f"R10 accuracy {ok}/{n_reads}"


def test_rna004_synthetic(tmp_path):
    model = load_builtin_model(MODEL_ID_RNA_RNA004)
    assert model.kmer_size == 9 and model.num_kmer == 262144
    rng = np.random.default_rng(99)
    n_ctg = 6
    L = 1400
    q = 500
    k = 9
    seqs = {f"tx{j}": _random_seq(rng, L) for j in range(n_ctg)}
    fa = tmp_path / "rna004.fa"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in seqs.items()))

    # RNA: ref track = min(1.5*q, L+1-k) events from the 3' END
    # (genref.c:129-136) -> reads must come from the 3' region; the raw
    # signal runs 3'->5', i.e. reversed event order (sigfish.c:860-867)
    n_events = 560
    truths = {}
    bl = str(tmp_path / "rna004.blow5")
    hdr = [{"experiment_type": "rna", "sequencing_kit": "sqk-rna004"}]
    with Slow5Writer(bl, header_data=hdr) as w:
        for i in range(24):
            name = f"tx{i % n_ctg}"
            seq = seqs[name]
            n_kmers = L + 1 - k
            # walk entirely inside the truncated 3' window (last 750)
            lo = n_kmers - int(1.5 * q)
            start = int(rng.integers(lo, n_kmers - n_events))
            levels = _walk_levels(seq, start, n_events, model)[::-1]
            # query = first q events of the REVERSED signal = the LAST q
            # events of the forward walk -> bases
            truths[f"r{i}"] = (
                name, "+", start + n_events - q, start + n_events
            )
            w.write_record(
                _mkrec(f"r{i}", _signal_from_levels(levels, rng, dwell=30))
            )

    opt = Options(
        rna=True, pore="rna004", prefix_size=0, query_size=q, engine="native"
    )
    ok, n_mapped, n_reads = _map_and_score(str(fa), bl, truths, opt)
    assert n_mapped == n_reads, f"only {n_mapped}/{n_reads} mapped"
    assert ok / n_reads >= 0.85, f"RNA004 accuracy {ok}/{n_reads}"
