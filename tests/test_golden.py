"""Golden-output regression: byte-compare against the C reference.

tests/golden/*.txt are the OUTPUTS OF THE C REFERENCE BINARY (built with
a stubbed model.h and fed the committed trained models via --kmer-model;
see scripts/parity_oracle.sh). The native CPU engine reproduces the
reference's scalar float order exactly, so on any host these must match
byte for byte -- any model, numerics, or semantics regression shows up
here without needing the oracle binary.
"""

import io

import pytest

from sigfish_tpu.eval import eval_main
from sigfish_tpu.models.export_tsv import main as export_tsvs
from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

REF = "/root/reference/test"
GOLD = "tests/golden"

DNA = (f"{REF}/nCoV-2019.reference.fasta", f"{REF}/sp1_dna.blow5")
RNA = (f"{REF}/rnasequin_sequences_2.4.fa", f"{REF}/sequin_rna.blow5")

CASES = {
    "dna_default": (DNA, {}),
    "dna_from_end": (DNA, dict(from_end=True)),
    "dna_q100": (DNA, dict(query_size=100)),
    "dna_p30": (DNA, dict(prefix_size=30)),
    "dna_sam": (DNA, dict(sam=True)),
    "rna_default": (RNA, dict(rna=True, query_size=500, prefix_size=-1)),
    "rna_fullref": (RNA, dict(rna=True, query_size=500, prefix_size=-1, full_ref=True)),
    "rna_from_end": (RNA, dict(rna=True, query_size=500, from_end=True)),
    "rna_dtw_std": (RNA, dict(rna=True, query_size=500, prefix_size=-1, dtw_std=True)),
    "rna_sam": (RNA, dict(rna=True, query_size=500, prefix_size=-1, sam=True)),
    "rna_invert": (RNA, dict(rna=True, query_size=500, prefix_size=0, invert=True, full_ref=True)),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    (fasta, blow5), kw = CASES[name]
    opt = Options(engine="native", **kw)
    core = Core(fasta, blow5, opt)
    out = io.StringIO()
    if opt.sam:
        from sigfish_tpu.output import sam_header
        from sigfish_tpu import __version__

        out.write(sam_header(core.ref.ref_names, core.ref.ref_lengths, __version__))
    run_dtw(core, out)
    core.close()
    want = open(f"{GOLD}/{name}.txt").read()
    assert out.getvalue() == want, f"{name}: output differs from the C reference golden"


def test_golden_eval(tmp_path):
    sink = io.StringIO()
    eval_main(f"{REF}/sp1_dna.minimap2.paf", f"{GOLD}/dna_default.txt", out=sink)
    want = open(f"{GOLD}/eval.txt").read()
    assert sink.getvalue() == want
