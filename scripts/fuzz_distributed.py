#!/usr/bin/env python
"""Randomized differential fuzz of the multi-process distributed runtime.

Each trial: a random workload (parity_fuzz's generator) and a random
legal flag subset, run once single-process and once as an N-process
`jax.distributed` cluster (`--hosts N`); host 0's ordered merge must be
byte-identical to the single-process output. Exercises the per-host
record-range split (byte-balanced, from one .idx pass), the
coordination-service KV gather, and the ordered emission across random
read counts/sizes — including workloads where some host's range is
empty.

Flags are restricted to ones whose semantics are host-count invariant
(-q/-p/--from-end/--full-ref/--sam/-K); --debug-break/-B cut batches
per process, so single-vs-multi outputs legitimately differ there.

Usage: python scripts/fuzz_distributed.py [n_trials] [base_seed] [n_hosts]
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from parity_fuzz import gen_workload  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_flags(rng: np.random.Generator, rna: bool) -> list[str]:
    flags: list[str] = []
    if rna:
        flags += ["--rna", "-q", str(int(rng.choice([50, 120, 250, 500])))]
        if rng.random() < 0.3:
            flags += ["-p", "-1"]
        else:
            flags += ["-p", str(int(rng.integers(0, 80)))]
            if rng.random() < 0.3:
                flags.append("--from-end")
        if rng.random() < 0.3:
            flags.append("--full-ref")
    else:
        flags += ["-q", str(int(rng.choice([40, 100, 250])))]
        flags += ["-p", str(int(rng.integers(0, 80)))]
        if rng.random() < 0.3:
            flags.append("--from-end")
    if rng.random() < 0.3:
        flags.append("--sam")
    if rng.random() < 0.3:
        flags += ["-K", str(int(rng.integers(2, 9)))]
    return flags


def run_trial(seed: int, n_hosts: int) -> bool:
    rng = np.random.default_rng(seed)
    rna = bool(rng.random() < 0.4)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["SIGFISH_TPU_NO_XLA_CACHE"] = "1"
    with tempfile.TemporaryDirectory() as d:
        fa, bl = gen_workload(rng, rna, d)
        flags = gen_flags(rng, rna)
        single = subprocess.run(
            [sys.executable, "-m", "sigfish_tpu.cli", "dtw", fa, bl] + flags,
            capture_output=True, env=env, timeout=600, cwd=REPO,
        )
        if single.returncode != 0:
            print(f"seed {seed}: single-process run failed rc={single.returncode}")
            print(single.stderr.decode()[-500:])
            return False

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        outs = [os.path.join(d, f"h{i}.paf") for i in range(n_hosts)]
        procs = [
            subprocess.Popen(
                [
                    sys.executable, "-m", "sigfish_tpu.cli", "dtw", fa, bl,
                    *flags,
                    "--hosts", str(n_hosts), "--host-id", str(i),
                    "--coordinator", f"localhost:{port}", "-o", outs[i],
                ],
                env=env, stderr=subprocess.PIPE, cwd=REPO,
            )
            for i in range(n_hosts)
        ]
        rcs = []
        errs = []
        for p in procs:
            _, e = p.communicate(timeout=900)
            rcs.append(p.returncode)
            errs.append(e)
        if any(rcs):
            print(f"seed {seed}: cluster rcs={rcs} {'rna' if rna else 'dna'} "
                  f"{' '.join(flags)}")
            for i, e in enumerate(errs):
                if rcs[i]:
                    print(f"  host {i} stderr:", e.decode()[-400:])
            return False
        merged = open(outs[0], "rb").read()
        ok = merged == single.stdout
        print(f"seed {seed}: {'OK' if ok else 'DIFF'}  "
              f"{'rna' if rna else 'dna'} hosts={n_hosts} {' '.join(flags)}  "
              f"({len(merged.splitlines())} lines)")
        if not ok:
            a = single.stdout.decode().splitlines()
            b = merged.decode().splitlines()
            for x, y in zip(a, b):
                if x != y:
                    print(f"  single: {x}\n  merged: {y}")
                    break
            if len(a) != len(b):
                print(f"  line counts: single {len(a)} vs merged {len(b)}")
        return ok


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 70000
    n_hosts = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    fails = sum(0 if run_trial(base + t, n_hosts) else 1 for t in range(n))
    print(f"== {n - fails}/{n} distributed trials byte-identical ==")
    return 1 if fails else 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)
