"""Reference synthesis tests. ref: genref.c, ref.h."""

import numpy as np

from sigfish_tpu.models.genref import (
    _seq_bytes,
    gen_ref,
    kmer_ranks,
    reverse_complement,
    zscore_f32,
)
from sigfish_tpu.models.pore_model import PoreModel


def _toy_model(k=3):
    n = 4 ** k
    rng = np.random.default_rng(0)
    return PoreModel(
        kmer_size=k,
        level_mean=rng.normal(100, 10, n).astype(np.float32),
        level_stdv=np.full(n, 2.0, np.float32),
    )


def test_kmer_rank_packing():
    # first base most significant, A=0 C=1 G=2 T=3 (ref.h:30-41)
    r = kmer_ranks(_seq_bytes("ACGT"), 2, warn_non_acgt=False)
    assert r.tolist() == [0 * 4 + 1, 1 * 4 + 2, 2 * 4 + 3]


def test_non_acgt_ranks_as_A():
    r1 = kmer_ranks(_seq_bytes("ANG"), 1, warn_non_acgt=False)
    assert r1.tolist() == [0, 0, 2]


def test_reverse_complement_non_acgt_to_T():
    # ref.h:62-64: default case complements to 'T'
    assert reverse_complement("ACGTN") == "TACGT"
    assert reverse_complement("N") == "T"
    assert reverse_complement("ACGT") == "ACGT"


def test_zscore_population_f32():
    x = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    z = zscore_f32(x)
    assert abs(float(z.mean())) < 1e-6
    # population (n) variance, not sample (n-1)
    np.testing.assert_allclose(float((z * z).mean()), 1.0, rtol=1e-6)


def test_dna_track_lengths_and_strands(tmp_path):
    m = _toy_model(3)
    fa = tmp_path / "t.fa"
    fa.write_text(">c1\nACGTACGTACGT\n>c2\nGGGGCCCC\n")
    ref = gen_ref(str(fa), m, rna=False)
    assert ref.num_ref == 2
    assert ref.ref_lengths == [10, 6]
    assert ref.ref_seq_lengths == [12, 8]
    assert ref.reverse is not None and len(ref.reverse) == 2
    assert ref.ref_st_offset == [0, 0]


def test_rna_truncation_and_offset(tmp_path):
    m = _toy_model(3)
    fa = tmp_path / "t.fa"
    seq = "ACGT" * 100  # L=400
    fa.write_text(f">r1\n{seq}\n")
    # query_size=100 -> ref_len = 150, from 3' end,
    # st_offset = L - ref_len - (k-1) = 400-150-2 = 248 (genref.c:133-136)
    ref = gen_ref(str(fa), m, rna=True, query_size=100)
    assert ref.ref_lengths == [150]
    assert ref.ref_st_offset == [248]
    assert ref.reverse is None
    # full-ref: no truncation, offset 0
    ref2 = gen_ref(str(fa), m, rna=True, full_ref=True, query_size=100)
    assert ref2.ref_lengths == [398]
    assert ref2.ref_st_offset == [0]
    # from-end: 5' end window, offset 0 (genref.c:186-188)
    ref3 = gen_ref(str(fa), m, rna=True, from_end=True, query_size=100)
    assert ref3.ref_lengths == [150]
    assert ref3.ref_st_offset == [0]


def test_tracks_are_zscored(tmp_path):
    m = _toy_model(3)
    fa = tmp_path / "t.fa"
    fa.write_text(">c1\nACGTACGTACGTGGATCCA\n")
    ref = gen_ref(str(fa), m, rna=False)
    t = ref.forward[0]
    assert abs(float(t.mean())) < 1e-5
    np.testing.assert_allclose(float((t * t).mean()), 1.0, rtol=1e-5)
