"""End-to-end accuracy gates: the reference's test/test.sh ported.

Case 1 (DNA): sp1_dna.blow5 x nCoV-2019 -> eval vs minimap2 truthset;
PASS iff mapped% >= 100 and correct% >= 85 (test.sh:49-59).
Case 2 (RNA): sequin_rna.blow5 x rnasequin --rna -q 500 -p -1;
correct% >= 75 (test.sh:61-71).

Runs on the CPU scan engine (conftest pins the CPU platform), so this
also regression-tests the non-Pallas path; byte-parity with the C
reference binary is covered separately by scripts/parity_oracle.sh.
"""

import io

import pytest

from sigfish_tpu.eval import eval_main
from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

REF = "/root/reference/test"


def _run(fasta, blow5, **kw):
    opt = Options(**kw)
    core = Core(fasta, blow5, opt)
    out = io.StringIO()
    run_dtw(core, out)
    core.close()
    return out.getvalue()


def _eval(truth, paf_text, tmp_path):
    test_paf = tmp_path / "test.paf"
    test_paf.write_text(paf_text)
    sink = io.StringIO()
    stat = eval_main(truth, str(test_paf), out=sink)
    mapped_pct = 100.0 * stat.test_mapped / max(stat.truth_mapped, 1)
    denom = stat.correct + stat.incorrect
    correct_pct = 100.0 * stat.correct / max(denom, 1)
    return mapped_pct, correct_pct


def test_dna_accuracy_gate(tmp_path):
    paf = _run(f"{REF}/nCoV-2019.reference.fasta", f"{REF}/sp1_dna.blow5")
    mapped, correct = _eval(f"{REF}/sp1_dna.minimap2.paf", paf, tmp_path)
    assert mapped >= 100.0, f"DNA mapped {mapped:.2f}% < 100%"
    assert correct >= 85.0, f"DNA correct {correct:.2f}% < 85%"


def test_rna_accuracy_gate(tmp_path):
    paf = _run(
        f"{REF}/rnasequin_sequences_2.4.fa",
        f"{REF}/sequin_rna.blow5",
        rna=True,
        query_size=500,
        prefix_size=-1,
    )
    lines = [l for l in paf.splitlines() if l]
    assert len(lines) == 8
    for l in lines:
        f = l.split("\t")
        assert len(f) >= 15
        assert f[4] == "+"  # RNA maps forward only
        assert 0 <= int(f[11]) <= 60
    mapped, correct = _eval(f"{REF}/sequin_rna.minimap2.paf", paf, tmp_path)
    assert mapped >= 100.0, f"RNA mapped {mapped:.2f}% < 100%"
    assert correct >= 75.0, f"RNA correct {correct:.2f}% < 75%"


def test_r10_and_rna004_smoke(tmp_path):
    """R10 / RNA004 chemistries end-to-end on synthesized inputs:
    header auto-detection picks the 9-mer models and the pipeline runs.
    (Accuracy is unvalidated for the derived 9-mer tables -- no in-repo
    R10/RNA004 data exists; see models/derive_models.py.)"""
    import numpy as np

    from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer

    src = Slow5File(f"{REF}/sp1_dna.blow5")
    recs = list(src)
    hdr = [dict(src.header_data[0])]
    src.close()
    hdr[0]["sequencing_kit"] = "sqk-lsk114"  # "114" -> R10 autodetect
    p = tmp_path / "r10.blow5"
    with Slow5Writer(str(p), header_data=hdr) as w:
        for r in recs[:2]:
            w.write_record(r)
    paf = _run(f"{REF}/nCoV-2019.reference.fasta", str(p))
    assert len([l for l in paf.splitlines() if l]) == 2

    # --pore rna004 via CLI opts (the reference rejects this flag due to
    # a validation bug, dtw_main.c:223 -- we accept it)
    src = Slow5File(f"{REF}/sequin_rna.blow5")
    rrecs = list(src)
    rhdr = [dict(src.header_data[0])]
    src.close()
    p2 = tmp_path / "rna004.blow5"
    with Slow5Writer(str(p2), header_data=rhdr) as w:
        w.write_record(rrecs[0])
    paf = _run(
        f"{REF}/rnasequin_sequences_2.4.fa", str(p2),
        rna=True, query_size=200, prefix_size=50, pore="rna004",
    )
    assert len([l for l in paf.splitlines() if l]) == 1


def test_clipped_reads_fallback_path(tmp_path):
    """Reads with fewer events than prefix+query take the too_short path
    with qlen < W -- the host-fallback candidate extraction (this path
    once shipped a read-only-array bug the full-length datasets never
    hit)."""
    import numpy as np

    from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer

    src = Slow5File(f"{REF}/sp1_dna.blow5")
    recs = list(src)
    hdr = src.header_data
    src.close()
    p = tmp_path / "mixed.blow5"
    with Slow5Writer(str(p), header_data=hdr) as w:
        for r in recs[:2]:
            w.write_record(r)
            w.write_record(
                Slow5Record(
                    read_id=f"{r.read_id}_cut", read_group=r.read_group,
                    digitisation=r.digitisation, offset=r.offset,
                    range=r.range, sampling_rate=r.sampling_rate,
                    raw_signal=r.raw_signal[:1200],
                )
            )
    # exercise the device engines' fallback too, not just native
    for engine in ("native", "scan"):
        opt = Options(engine=engine)
        core = Core(f"{REF}/nCoV-2019.reference.fasta", str(p), opt)
        out = io.StringIO()
        run_dtw(core, out)
        core.close()
        lines = [l for l in out.getvalue().splitlines() if l]
        assert len(lines) == 4, (engine, len(lines))
        assert core.too_short == 2


def test_clipped_device_path_matches_native(tmp_path):
    """Clipped reads (qlen != W) through the device engines' segmented
    window pass (device_topk_candidates) must match the native engine's
    exact per-read DP byte-for-byte (ref sigfish.c:457-461)."""
    import numpy as np

    from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer
    from sigfish_tpu.runtime.pipeline import Core, Options, process_batch

    src = Slow5File("/root/reference/test/sp1_dna.blow5")
    recs = list(src)
    hdr = src.header_data
    src.close()
    p = str(tmp_path / "mixed.blow5")
    with Slow5Writer(p, header_data=hdr) as w:
        for r in recs:
            w.write_record(r)
            for cut in (2000, 1200, 800):
                w.write_record(
                    Slow5Record(
                        read_id=f"{r.read_id}_cut{cut}",
                        read_group=r.read_group,
                        digitisation=r.digitisation,
                        offset=r.offset,
                        range=r.range,
                        sampling_rate=r.sampling_rate,
                        raw_signal=r.raw_signal[:cut],
                    )
                )

    outs = {}
    for engine in ("native", "scan"):
        core = Core(
            "/root/reference/test/nCoV-2019.reference.fasta", p,
            Options(engine=engine),
        )
        blobs = core.sf.read_batch(512, 10**9)
        lines, _ = process_batch(core, blobs)
        outs[engine] = [l for l in lines if l]
        core.close()
    assert outs["scan"] == outs["native"]
    assert len(outs["scan"]) == 20  # 5 full + 15 clipped, all mapped


def test_press_matrix_identical_output(tmp_path):
    """The same reads stored under every record x signal compression
    combination (incl. slow5lib's hidden dev signal codes 250=zlib /
    251=zstd, slow5_press.c:100-148, and ASCII .slow5) must produce
    byte-identical PAF -- decode correctness end-to-end, not just
    roundtrip (slow5lib ecosystem interop)."""
    from sigfish_tpu.io.blow5 import Slow5File, Slow5Writer

    src = Slow5File(f"{REF}/sp1_dna.blow5")
    recs = list(src)
    hdr = src.header_data
    src.close()

    combos = [
        ("none", "none", ".blow5"),
        ("zlib", "svb-zd", ".blow5"),
        ("zlib", "zlib", ".blow5"),    # dev code 250
        ("zlib", "zstd", ".blow5"),    # dev code 251
        ("zstd", "svb-zd", ".blow5"),
        ("zstd", "zstd", ".blow5"),    # full-zstd file, native decode
        ("none", "svb-zd", ".blow5"),
        (None, None, ".slow5"),        # ASCII
    ]
    outs = []
    for rec_press, sig_press, ext in combos:
        p = tmp_path / f"m_{rec_press}_{sig_press}{ext}".replace("/", "_")
        kw = {}
        if ext == ".blow5":
            kw = dict(rec_press=rec_press, sig_press=sig_press)
        with Slow5Writer(str(p), header_data=hdr, **kw) as w:
            for r in recs:
                w.write_record(r)
        outs.append(
            _run(f"{REF}/nCoV-2019.reference.fasta", str(p), num_thread=2)
        )
    assert all(o == outs[0] for o in outs[1:]), "press combos diverge"
    assert outs[0].count("\n") == len(recs)


def test_library_example_runs():
    """examples/map_reads.py (the README Library API tour) must keep
    working; run it in-process with stdout captured."""
    import contextlib
    import os
    import runpy

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "map_reads.py",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        runpy.run_path(path, run_name="__main__")
    out = buf.getvalue()
    assert "wrote + re-read 5 records" in out
    assert out.count("MN908947.3:") == 5
    assert "batch 2: 1 reads, 1 mapped" in out


def test_forced_native_engine_without_native_lib(tmp_path, monkeypatch):
    """`--engine native` on a host where the C++ extension is unavailable
    (SIGFISH_TPU_NO_NATIVE=1) must fall back to the exact-scalar Python
    oracle per track -- NOT silently report every read unmapped (the DP
    helper returns None without touching its out= buffer, which once
    left the 3.0e38 fill in place)."""
    import numpy as np

    from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer

    # small reference: the Python O(n*m) scalar DP is ~100k cells/track
    rng = np.random.default_rng(7)
    contig = "".join(rng.choice(list("ACGT"), size=300))
    fa = tmp_path / "small.fa"
    fa.write_text(f">tiny\n{contig}\n")

    src = Slow5File(f"{REF}/sp1_dna.blow5")
    recs = list(src)
    hdr = src.header_data
    src.close()
    p = str(tmp_path / "two.blow5")
    with Slow5Writer(p, header_data=hdr) as w:
        for r in recs[:2]:
            w.write_record(r)

    def run_native():
        return _run(str(fa), p, engine="native")

    with_lib = run_native()
    monkeypatch.setenv("SIGFISH_TPU_NO_NATIVE", "1")
    without_lib = run_native()
    # both runs emit a PAF line per read (mapping to the tiny contig is
    # meaningless but deterministic), byte-identical: the fallback is
    # the same exact scalar order as the C kernel
    assert with_lib == without_lib
    assert len([l for l in with_lib.splitlines() if l]) == 2


def test_host_stages_device_identical_output():
    """--host-stages device (batched JAX eventization,
    ops/events_device.py) must produce byte-identical PAF to the host
    path on the CPU backend -- both chemistries, incl. the RNA polyA
    autodetect whose query start depends on exact event boundaries."""
    import jax

    try:
        host_dna = _run(f"{REF}/nCoV-2019.reference.fasta", f"{REF}/sp1_dna.blow5")
        dev_dna = _run(
            f"{REF}/nCoV-2019.reference.fasta", f"{REF}/sp1_dna.blow5",
            host_stages="device",
        )
        assert dev_dna == host_dna
        host_rna = _run(
            f"{REF}/rnasequin_sequences_2.4.fa", f"{REF}/sequin_rna.blow5",
            rna=True, query_size=500, prefix_size=-1,
        )
        dev_rna = _run(
            f"{REF}/rnasequin_sequences_2.4.fa", f"{REF}/sequin_rna.blow5",
            rna=True, query_size=500, prefix_size=-1, host_stages="device",
        )
        assert dev_rna == host_rna
    finally:
        # Core enables x64 for the device eventizer; restore the suite's
        # default dtype behavior
        jax.config.update("jax_enable_x64", False)
