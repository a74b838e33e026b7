#!/usr/bin/env python
"""Randomized differential parity fuzzing vs the C reference binary.

Each trial generates a random workload -- FASTA (1-5 contigs of random
length), BLOW5 (model-derived reads from random positions/strands,
pure-noise reads, clipped short reads) -- plus a random legal flag
combination, runs both the oracle and this build, and byte-diffs the
output. Catches parity edges the fixed 23-case matrix misses (mapq
boundaries, candidate ties, window-truncation corners, degraded reads).

Requires the oracle at /tmp/refbuild/sigfish and the exported model
TSVs at /tmp/sigfish_models (see scripts/parity_oracle.sh header).

Usage: python scripts/parity_fuzz.py [n_trials] [base_seed]
Exit nonzero on any diff. ~4 s per DNA trial, ~8 s per RNA trial.
Set SIGFISH_FUZZ_ENGINE=scan (or pallas/native) to fuzz a specific
sDTW engine; default is the auto-selected one (native on CPU hosts).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ORACLE = os.environ.get("ORACLE", "/tmp/refbuild/sigfish")
DNA_TSV = "/tmp/sigfish_models/r9.4_dna_6mer.tsv"
RNA_TSV = "/tmp/sigfish_models/r9.4_rna_5mer.tsv"
R10_TSV = "/tmp/sigfish_models/r10.4_dna_9mer.tsv"
RNA004_TSV = "/tmp/sigfish_models/rna004_rna_9mer.tsv"

# SIGFISH_FUZZ_PORE=r10|rna004 fuzzes the 9-mer chemistries: the BLOW5
# header carries a sequencing_kit that both sides auto-detect from
# (ref pore_detect sigfish.c:53-77; the C binary's --pore rna004 CLI
# path is unreachable due to its dtw_main.c:223 bug, so header
# detection is the only way to drive the oracle into these paths),
# and --kmer-model supplies the same 9-mer table to both. Exercises
# k=9 rank packing in genref and the RNA004 jnn parameter set.
PORE_KIT = {"r10": "sqk-lsk114", "rna004": "sqk-rna004"}

DIGI, RANGE, OFF, RATE = 8192.0, 1400.0, 5.0, 4000.0


def gen_workload(rng: np.random.Generator, rna: bool, d: str, pore: str = "r9",
                 force_mappable: bool = False):
    from sigfish_tpu.io.blow5 import Slow5Record, Slow5Writer
    from sigfish_tpu.models.genref import _seq_bytes, kmer_ranks, reverse_complement
    from sigfish_tpu.models.pore_model import (
        MODEL_ID_DNA_R9,
        MODEL_ID_DNA_R10,
        MODEL_ID_RNA_R9,
        MODEL_ID_RNA_RNA004,
        load_builtin_model,
    )

    mid = {
        ("r9", False): MODEL_ID_DNA_R9,
        ("r9", True): MODEL_ID_RNA_R9,
        ("r10", False): MODEL_ID_DNA_R10,
        ("rna004", True): MODEL_ID_RNA_RNA004,
    }[(pore, rna)]
    model = load_builtin_model(mid)
    k = model.kmer_size
    n_ctg = int(rng.integers(1, 6))
    seqs = {}
    for c in range(n_ctg):
        L = int(rng.integers(max(300, k + 50), 3000))
        seqs[f"c{c}"] = "".join("ACGT"[b] for b in rng.integers(0, 4, L))
    fa = os.path.join(d, "ref.fa")
    with open(fa, "w") as f:
        for n, s in seqs.items():
            f.write(f">{n}\n{s}\n")

    def levels(seq, start, n_ev):
        ranks = kmer_ranks(_seq_bytes(seq[start : start + n_ev + k - 1]), k,
                           warn_non_acgt=False)
        return model.level_mean[ranks]

    def to_adc(pa, digi, rng_pa, off):
        dwell = int(rng.integers(8, 30 if rna else 14))
        dw = rng.integers(dwell - 2, dwell + 3, size=pa.size)
        x = np.repeat(pa, dw).astype(np.float64)
        x += rng.normal(0, 1.5, x.size)
        return np.clip(np.rint(x * digi / rng_pa - off), -30000, 30000).astype(np.int16)

    def calibration():
        # per-read ADC calibration variety: exercises the f32 pA
        # conversion (raw+offset)*range/digitisation at several
        # quantization scales (ref sigfish.c:344-347)
        if rng.random() < 0.3:
            return (float(rng.choice([2048.0, 4096.0, 8192.0])),
                    float(rng.choice([748.5, 1400.0, 2048.0])),
                    float(rng.integers(-10, 21)),
                    float(rng.choice([3012.0, 4000.0])))
        return DIGI, RANGE, OFF, RATE

    bl = os.path.join(d, "reads.blow5")
    n_reads = int(rng.integers(6, 25))
    # sometimes two read groups (exercises per-group header_get +
    # multi-group auto-detect warnings, ref sigfish.c:118-135)
    n_grp = 2 if rng.random() < 0.2 else 1
    attrs = {"experiment_type": "rna" if rna else "genomic_dna"}
    if pore != "r9":
        attrs["sequencing_kit"] = PORE_KIT[pore]
    hdr = [dict(attrs) for _ in range(n_grp)]
    with Slow5Writer(bl, header_data=hdr) as w:
        for i in range(n_reads):
            digi, rng_pa, off, rate = calibration()
            kind = rng.random()
            # SIGFISH_FUZZ_MAPPABLE=1: model-derived reads only (drawn
            # identically so seeds stay comparable). Pure-noise/short
            # reads crash the C oracle on ~40% of workloads (the
            # dead-code MAD-trim path: events.c:246 assert, or the
            # trim_and_segment_raw free -> use-after-free at
            # events.c:264/304 when trimming consumes the whole read),
            # which turns parity trials into crash-robustness trials --
            # useful for the default leg, noise for the 9-mer legs.
            if force_mappable or os.environ.get("SIGFISH_FUZZ_MAPPABLE"):
                kind = 0.0
            if kind < 0.6:  # model-derived mappable read
                name = f"c{int(rng.integers(0, n_ctg))}"
                seq = seqs[name]
                if (not rna) and rng.random() < 0.5:
                    seq = reverse_complement(seq)
                # occasional LONG reads (up to the whole contig at high
                # dwell, tens of kilosamples) stress the prefix-bounded
                # eventization retry/EMA path where the bound actually
                # truncates (runtime/pipeline._prepare_read_prefix)
                n_ev = int(rng.integers(80, 2500 if rng.random() < 0.25 else 400))
                n_ev = min(n_ev, len(seq) - k)
                start = int(rng.integers(0, len(seq) - n_ev - k + 1))
                lv = levels(seq, start, n_ev)
                if rna:
                    lv = lv[::-1]
                sig = to_adc(lv, digi, rng_pa, off)
            elif kind < 0.8:  # pure noise
                n = int(rng.integers(400, 9000))
                sig = rng.integers(300, 900, n).astype(np.int16)
            else:  # short / clipped
                n = int(rng.integers(30, 1200))
                sig = rng.integers(300, 900, n).astype(np.int16)
            w.write_record(
                Slow5Record(
                    read_id=f"f{i}", read_group=int(rng.integers(0, n_grp)),
                    digitisation=digi, offset=off, range=rng_pa,
                    sampling_rate=rate, raw_signal=sig,
                )
            )
    return fa, bl


def gen_flags(rng: np.random.Generator, rna: bool) -> list[str]:
    flags: list[str] = []
    if rna:
        flags.append("--rna")
        q = int(rng.choice([50, 120, 250, 500]))
        flags += ["-q", str(q)]
        r = rng.random()
        if r < 0.3:
            flags += ["-p", "-1"]
        else:
            flags += ["-p", str(int(rng.integers(0, 80)))]
            if rng.random() < 0.3:
                flags.append("--from-end")
            elif rng.random() < 0.15:
                flags.append("--invert")  # RNA-only, not with -p -1/--from-end
        if rng.random() < 0.3:
            flags.append("--full-ref")
        if rng.random() < 0.2:
            flags.append("--dtw-std")
    else:
        q = int(rng.choice([40, 100, 250]))
        flags += ["-q", str(q), "-p", str(int(rng.integers(0, 80)))]
        if rng.random() < 0.3:
            flags.append("--from-end")
    if rng.random() < 0.3:
        flags.append("--sam")
    if rng.random() < 0.3:
        flags += ["-K", str(int(rng.integers(2, 9)))]
    elif rng.random() < 0.25:
        # byte-bounded batching: small -B caps force load_db to cut
        # batches on the byte limit instead of K (ref sigfish.c:283-301)
        flags += ["-B", f"{rng.choice([0.02, 0.05, 0.1])}M"]
    if rng.random() < 0.15:
        # early loop exit after N batches (ref dtw_main.c:322-325)
        flags += ["--debug-break", str(int(rng.integers(1, 4)))]
    return flags


def run_trial(seed: int, force_mappable: bool = False,
              strategy: str = "primary") -> dict:
    """One differential trial. Returns a tally dict:
    ok        -- trial verdict (False on any byte diff / nonzero exit)
    diffed    -- 1 if a byte comparison against the oracle actually ran
    crashed   -- 1 if the oracle crashed on the generated workload
    strategy  -- which regeneration finally produced the byte diff
                 ("primary" / "mappable" / "reseed")
    A crashed trial does NOT lose diff power silently: our graceful
    handling of the crashing workload is still required (exit 0), and
    the trial is re-run through an escalating regeneration chain until
    a byte diff lands (VERDICT r2 weak #4, r3 weak #4):
      1. mappable-only regeneration of the same seed (model-derived
         reads only -- avoids the oracle's MAD-trim crash on noise)
      2. reseed: a fresh mappable-only workload from a derived seed
         (seed + 500000) -- covers the rare seed whose mappable
         regeneration still crashes the oracle"""
    rng = np.random.default_rng(seed)
    pore = os.environ.get("SIGFISH_FUZZ_PORE", "r9")
    if pore == "r10":
        rna = False
        rng.random()  # keep the draw count aligned with the r9 stream
    elif pore == "rna004":
        rna = True
        rng.random()
    else:
        rna = bool(rng.random() < 0.4)
    with tempfile.TemporaryDirectory() as d:
        fa, bl = gen_workload(rng, rna, d, pore=pore,
                              force_mappable=force_mappable)
        flags = gen_flags(rng, rna)
        tsv = {
            "r9": RNA_TSV if rna else DNA_TSV,
            "r10": R10_TSV,
            "rna004": RNA004_TSV,
        }[pore]
        cmd_common = [fa, bl, "--kmer-model", tsv] + flags
        eng = os.environ.get("SIGFISH_FUZZ_ENGINE")
        ours_extra = ["--engine", eng] if eng else []
        # chunked-reference leg: force tiny segments on OUR side only
        # (the oracle has no such knob; chunking must not change a byte)
        ref_chunk = os.environ.get("SIGFISH_FUZZ_REF_CHUNK")
        if ref_chunk:
            ours_extra += ["--ref-chunk", ref_chunk]
        env = dict(os.environ)
        if eng == "pallas" and not os.environ.get("SIGFISH_FUZZ_PALLAS_CPU"):
            # the TPU leg: leave the platform alone (axon device).
            # SIGFISH_FUZZ_PALLAS_CPU=1 keeps the CPU backend instead --
            # the wavefront runs the Pallas interpreter (same numerics,
            # no hardware needed; how the chunked-ref leg fuzzes offline)
            env.pop("JAX_PLATFORMS", None)
        else:
            env["JAX_PLATFORMS"] = "cpu"
            env["PALLAS_AXON_POOL_IPS"] = ""
        mesh = os.environ.get("SIGFISH_FUZZ_MESH")
        if mesh:
            # sharded-mesh leg is a SHARDING-INVARIANCE differential:
            # ours --mesh DPxTP (virtual CPU devices) vs ours
            # single-device, SAME engine, byte-equal. The oracle is the
            # wrong baseline here: CPU mesh rides the scan engine, whose
            # prefix-min reassociation is a documented ±ulp deviation
            # that occasionally flips a %.2f digit (the production TPU
            # mesh rides the bit-exact wavefront kernel instead). The
            # sharding machinery itself must be exactly invariant.
            n_dev = 1
            for part in mesh.lower().split("x"):
                n_dev *= int(part)
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n_dev}"
            )
            base_cmd = [sys.executable, "-m", "sigfish_tpu.cli", "dtw"]
            cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            # SIGFISH_FUZZ_MESH_ENGINE=pallas rides the wavefront
            # interpreter on the CPU mesh (covers ring_topk_wavefront /
            # sharded_engine_topk); ref-chunk applies to the MESH side
            # only, so the differential also covers mesh x chunking
            meng = os.environ.get("SIGFISH_FUZZ_MESH_ENGINE", "scan")
            mesh_extra = ["--ref-chunk", ref_chunk] if ref_chunk else []
            r1 = subprocess.run(
                base_cmd + cmd_common + ["--engine", meng],
                capture_output=True, env=env, timeout=2400, cwd=cwd,
            )
            r2 = subprocess.run(
                base_cmd + cmd_common
                + ["--engine", meng, "--mesh", mesh] + mesh_extra,
                capture_output=True, env=env, timeout=2400, cwd=cwd,
            )
            ok = (
                r1.returncode == 0
                and r2.returncode == 0
                and r1.stdout == r2.stdout
            )
            print(f"seed {seed}: {'OK' if ok else 'DIFF'}  mesh={mesh} "
                  f"eng={meng} {pore} {'rna' if rna else 'dna'} "
                  f"{' '.join(flags)}  "
                  f"({len(r1.stdout.splitlines())} lines)")
            if not ok and r2.returncode != 0:
                print("  mesh stderr:", r2.stderr.decode()[-500:])
            elif not ok:
                for a, b in zip(r1.stdout.decode().splitlines(),
                                r2.stdout.decode().splitlines()):
                    if a != b:
                        print(f"  single: {a}\n  mesh:   {b}")
                        break
            return dict(ok=ok, diffed=1, crashed=0, strategy=strategy)
        ro = subprocess.run(
            [ORACLE, "dtw", "-t", "1"] + cmd_common,
            capture_output=True, timeout=600,
        )
        rs = subprocess.run(
            [sys.executable, "-m", "sigfish_tpu.cli", "dtw"]
            + cmd_common + ours_extra,
            capture_output=True, env=env,
            timeout=1800 if eng == "pallas" else 600,  # axon first-touch stall
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if ro.returncode != 0:
            # the reference crashes on some degraded inputs (PARITY.md
            # Robustness: the dead-code MAD-trim assert/use-after-free);
            # we must still exit 0. The byte diff is NOT silently lost:
            # the trial re-runs with a mappable-only regeneration of the
            # same seed, which the oracle survives, so diff power stays.
            graceful = rs.returncode == 0
            nxt = {"primary": "mappable", "mappable": "reseed"}.get(strategy)
            print(f"seed {seed}: oracle crashed (rc={ro.returncode}), "
                  f"ours rc={rs.returncode} [{'OK' if graceful else 'FAIL'}] "
                  f"{pore} {'rna' if rna else 'dna'} {' '.join(flags)} "
                  f"[strategy={strategy}]"
                  + (f" -> retry {nxt}" if nxt else " -> giving up"))
            if not graceful or nxt is None:
                return dict(ok=graceful, diffed=0, crashed=1,
                            strategy=strategy)
            retry = run_trial(
                seed if nxt == "mappable" else seed + 500_000,
                force_mappable=True, strategy=nxt,
            )
            return dict(ok=graceful and retry["ok"], diffed=retry["diffed"],
                        crashed=1 + retry["crashed"],
                        strategy=retry["strategy"])
        ok = rs.returncode == 0 and ro.stdout == rs.stdout
        status = "OK" if ok else "DIFF"
        print(f"seed {seed}: {status}  {pore} {'rna' if rna else 'dna'} "
              f"{' '.join(flags)}  ({len(ro.stdout.splitlines())} lines)"
              + (f" [strategy={strategy}]" if strategy != "primary" else ""))
        if not ok:
            o = ro.stdout.decode().splitlines()
            u = rs.stdout.decode().splitlines()
            for a, b in zip(o, u):
                if a != b:
                    print(f"  oracle: {a}\n  ours:   {b}")
                    break
            if len(o) != len(u):
                print(f"  line counts: oracle {len(o)} vs ours {len(u)}")
            if rs.returncode != 0:
                print("  stderr:", rs.stderr.decode()[-500:])
        return dict(ok=ok, diffed=1, crashed=0, strategy=strategy)


def ensure_oracle() -> None:
    """Bootstrap /tmp/refbuild + model TSVs if missing (e.g. post-reboot)."""
    if os.access(ORACLE, os.X_OK) and os.path.exists(DNA_TSV):
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        ["bash", os.path.join(repo, "scripts", "build_oracle.sh")], check=True
    )


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Randomized differential parity fuzzing vs the C "
        "reference binary (see module docstring).")
    ap.add_argument("n_trials", nargs="?", type=int, default=20,
                    help="number of trials (default 20)")
    ap.add_argument("base_seed", nargs="?", type=int, default=None,
                    help="positional alias for --seed-base")
    ap.add_argument("--seed-base", type=int, default=1000,
                    help="first trial seed (default 1000)")
    ap.add_argument("--mappable", action="store_true",
                    help="model-derived mappable reads only "
                    "(= SIGFISH_FUZZ_MAPPABLE=1)")
    ap.add_argument("--engine", choices=["scan", "pallas", "native"],
                    help="pin the sDTW engine (= SIGFISH_FUZZ_ENGINE)")
    ap.add_argument("--pore", choices=["r9", "r10", "rna004"],
                    help="pin the chemistry (= SIGFISH_FUZZ_PORE)")
    ap.add_argument("--mesh",
                    help="sharding-invariance leg, e.g. 2x2 "
                    "(= SIGFISH_FUZZ_MESH; diffs ours-vs-ours)")
    ap.add_argument("--mesh-engine", choices=["scan", "pallas"],
                    help="engine for the mesh leg (default scan; pallas "
                    "= wavefront interpreter, covers the top-k merge) "
                    "(= SIGFISH_FUZZ_MESH_ENGINE)")
    ap.add_argument("--ref-chunk", dest="ref_chunk",
                    help="force --ref-chunk N on our side (mesh leg: on "
                    "the mesh side) (= SIGFISH_FUZZ_REF_CHUNK)")
    args = ap.parse_args()
    # the env vars remain the plumbing run_trial reads (and stay usable
    # directly); the flags just set them
    if args.mappable:
        os.environ["SIGFISH_FUZZ_MAPPABLE"] = "1"
    if args.engine:
        os.environ["SIGFISH_FUZZ_ENGINE"] = args.engine
    if args.pore:
        os.environ["SIGFISH_FUZZ_PORE"] = args.pore
    if args.mesh:
        os.environ["SIGFISH_FUZZ_MESH"] = args.mesh
    if args.mesh_engine:
        os.environ["SIGFISH_FUZZ_MESH_ENGINE"] = args.mesh_engine
    if args.ref_chunk:
        os.environ["SIGFISH_FUZZ_REF_CHUNK"] = args.ref_chunk
    n = args.n_trials
    base = args.base_seed if args.base_seed is not None else args.seed_base
    ensure_oracle()
    fails = diffed = crashed = 0
    strategies: dict[str, int] = {}
    for t in range(n):
        r = run_trial(base + t)
        if not r["ok"]:
            fails += 1
        diffed += r["diffed"]
        crashed += r["crashed"]
        if r["diffed"]:
            strategies[r["strategy"]] = strategies.get(r["strategy"], 0) + 1
    strat = ", ".join(f"{k}={v}" for k, v in sorted(strategies.items()))
    print(f"== {n - fails}/{n} trials pass: {diffed} byte-diffed "
          f"({strat}), {crashed} oracle-crash (graceful-handling "
          f"checked, diff recovered via regeneration chain) ==")
    return 1 if fails else 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
