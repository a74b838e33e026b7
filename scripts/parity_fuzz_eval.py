#!/usr/bin/env python
"""Randomized differential fuzzing of the `eval` subtool vs the C oracle.

Each trial generates a random truth/test PAF pair -- overlapping and
disjoint read ids, multi-mapping truth reads, near/far coordinates
around the <100 threshold (eval.c:218), both strands, tp:A:P/S tags,
and C-atoi-tolerant junk numerics ("123.5", "12abc", "+", "") -- runs
`sigfish eval` (oracle) and `python -m sigfish_tpu.cli eval` with a
random flag subset, and byte-diffs stdout.

Requires the oracle at /tmp/refbuild/sigfish (scripts/parity_oracle.sh).

Usage: python scripts/parity_fuzz_eval.py [n_trials] [base_seed]
Exit nonzero on any diff.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

ORACLE = os.environ.get("ORACLE", "/tmp/refbuild/sigfish")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _num(rng: np.random.Generator, lo: int, hi: int) -> str:
    """A numeric column, sometimes with junk C atoi tolerates."""
    v = int(rng.integers(lo, hi))
    r = rng.random()
    if r < 0.08:
        return f"{v}.{int(rng.integers(0, 99))}"  # float-ish
    if r < 0.12:
        return f"{v}x{int(rng.integers(0, 9))}"   # trailing junk
    if r < 0.14:
        return "+" if v >= 0 else "-"             # sign only -> 0
    return str(v)


def gen_paf(rng: np.random.Generator, rids: list[str], tids: list[str],
            truth: dict | None) -> tuple[str, dict]:
    """One PAF file; returns (text, {rid: (tid, strand, st, en)})."""
    lines = []
    recs: dict = {}
    for rid in rids:
        n_map = 1 + (rng.random() < 0.2)  # multi-mapping sometimes
        for _ in range(n_map):
            tid = tids[int(rng.integers(0, len(tids)))]
            strand = "+" if rng.random() < 0.5 else "-"
            st = int(rng.integers(0, 5000))
            en = st + int(rng.integers(50, 2000))
            if truth is not None and rid in truth and rng.random() < 0.6:
                # test record near the truth mapping: exercise the
                # min(|dst|,|den|) < 100 boundary on both sides
                tid, strand, tst, ten = truth[rid]
                delta = int(rng.integers(-130, 131))
                st, en = tst + delta, ten + int(rng.integers(-130, 131))
            mapq = int(rng.integers(0, 61))
            tags = []
            if rng.random() < 0.5:
                tags.append("tp:A:S" if rng.random() < 0.3 else "tp:A:P")
            if rng.random() < 0.2:
                tags.append("d1:f:12.50")
            cols = [
                rid, _num(rng, 100, 99999), _num(rng, 0, 500),
                _num(rng, 500, 5000), strand, tid, _num(rng, 1000, 99999),
                str(st), str(en), _num(rng, 0, 2000), _num(rng, 50, 2000),
                str(mapq),
            ] + tags
            lines.append("\t".join(cols))
            recs.setdefault(rid, (tid, strand, st, en))
    return "\n".join(lines) + "\n", recs


def run_trial(seed: int) -> bool:
    rng = np.random.default_rng(seed)
    pool = [f"r{i}" for i in range(int(rng.integers(3, 40)))]
    tids = [f"t{i}" for i in range(int(rng.integers(1, 6)))]
    # truth covers a subset; test covers an overlapping subset
    t_ids = [r for r in pool if rng.random() < 0.8]
    s_ids = [r for r in pool if rng.random() < 0.8]
    truth_txt, truth = gen_paf(rng, t_ids, tids, None)
    test_txt, _ = gen_paf(rng, s_ids, tids, truth)
    flags = []
    if rng.random() < 0.3:
        flags += ["--secondary", "no"]
    if rng.random() < 0.3:
        flags.append("--tid-only")
    with tempfile.TemporaryDirectory() as d:
        tp, sp = os.path.join(d, "truth.paf"), os.path.join(d, "test.paf")
        open(tp, "w").write(truth_txt)
        open(sp, "w").write(test_txt)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        ro = subprocess.run([ORACLE, "eval", tp, sp] + flags,
                            capture_output=True, timeout=120)
        rs = subprocess.run(
            [sys.executable, "-m", "sigfish_tpu.cli", "eval", tp, sp] + flags,
            capture_output=True, timeout=120, env=env, cwd=REPO)
        if ro.returncode != 0:
            ok = rs.returncode != 0 or not s_ids
            print(f"seed {seed}: oracle rc={ro.returncode}, ours "
                  f"rc={rs.returncode} [{'OK' if ok else 'FAIL'}] {flags}")
            return ok
        ok = rs.returncode == 0 and ro.stdout == rs.stdout
        print(f"seed {seed}: {'OK' if ok else 'DIFF'}  {flags} "
              f"({len(t_ids)}t/{len(s_ids)}s)")
        if not ok:
            o, u = ro.stdout.decode().splitlines(), rs.stdout.decode().splitlines()
            for a, b in zip(o, u):
                if a != b:
                    print(f"  oracle: {a}\n  ours:   {b}")
                    break
            if len(o) != len(u):
                print(f"  line counts: {len(o)} vs {len(u)}")
            if rs.returncode != 0:
                print("  stderr:", rs.stderr.decode()[-500:])
        return ok


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    if not os.access(ORACLE, os.X_OK):
        subprocess.run(
            ["bash", os.path.join(REPO, "scripts", "build_oracle.sh")],
            check=True,
        )
    fails = sum(0 if run_trial(base + t) else 1 for t in range(n))
    print(f"== {n - fails}/{n} eval trials byte-identical ==")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
