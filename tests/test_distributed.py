"""Multi-host distributed runtime: N separate processes forming a
jax.distributed cluster must reproduce the single-process output
byte-for-byte (ref: the reference's scale layer is thread.c:119; the
TPU-native replacement is jax.distributed + contiguous per-host record
ranges + host-0 ordered emission, SURVEY §2.3/§7-step-7)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

FA = "/root/reference/test/nCoV-2019.reference.fasta"
BL = "/root/reference/test/sp1_dna.blow5"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env() -> dict[str, str]:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SIGFISH_TPU_NO_XLA_CACHE"] = "1"
    env.pop("XLA_FLAGS", None)  # plain 1-device CPU per process
    # keep the axon TPU client out of CPU-only subprocesses (its relay
    # handshake serializes back-to-back processes for minutes)
    env["PALLAS_AXON_POOL_IPS"] = ""
    return env


# coordination-service failure signatures that mean "starved host on an
# oversubscribed machine", not a product bug -- retried once
_FLAKY = ("DEADLINE_EXCEEDED", "Timed out", "timed out", "UNAVAILABLE",
          "heartbeat")


def _cluster_once(n_hosts: int, fa: str, bl: str, outs: list[str],
                  extra: list[str]) -> list[str] | None:
    """Run one N-process cluster; returns per-host stderr on failure,
    None on success."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "sigfish_tpu.cli", "dtw", fa, bl,
                "--hosts", str(n_hosts), "--host-id", str(i),
                "--coordinator", f"localhost:{port}", "-o", outs[i],
            ]
            + extra,
            env=_env(),
            stderr=subprocess.PIPE,
            cwd="/root/repo",
        )
        for i in range(n_hosts)
    ]
    errs, rcs = [], []
    for p in procs:
        _, err = p.communicate(timeout=900)
        errs.append(err.decode())
        rcs.append(p.returncode)
    return None if all(rc == 0 for rc in rcs) else errs


def _run_cluster_files(n_hosts: int, fa: str, bl: str, outs: list[str],
                       extra: list[str]) -> None:
    errs = _cluster_once(n_hosts, fa, bl, outs, extra)
    if errs is not None and any(
        sig in e for e in errs for sig in _FLAKY
    ):
        errs = _cluster_once(n_hosts, fa, bl, outs, extra)  # retry once
    assert errs is None, "cluster failed:\n" + "\n---\n".join(
        e[-2000:] for e in errs
    )


def _run_cluster(n_hosts: int, tmp_path, extra: list[str]) -> str:
    outs = [str(tmp_path / f"h{i}.paf") for i in range(n_hosts)]
    _run_cluster_files(n_hosts, FA, BL, outs, extra)
    # hosts 1..N-1 emit nothing -- they never even open their --output
    # (all hosts typically share one path); host 0 emits the ordered merge
    for i in range(1, n_hosts):
        assert not os.path.exists(outs[i]) or os.path.getsize(outs[i]) == 0
    return open(outs[0]).read()


def _run_single(tmp_path, extra: list[str]) -> str:
    out = str(tmp_path / "single.paf")
    r = subprocess.run(
        [sys.executable, "-m", "sigfish_tpu.cli", "dtw", FA, BL, "-o", out]
        + extra,
        env=_env(),
        capture_output=True,
        cwd="/root/repo",
        timeout=900,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    return open(out).read()


@pytest.mark.parametrize("n_hosts", [2, 3])
def test_multiprocess_merge_byte_identical(tmp_path, n_hosts):
    single = _run_single(tmp_path, [])
    merged = _run_cluster(n_hosts, tmp_path, [])
    assert merged == single
    assert len(merged.splitlines()) == 5


def test_multiprocess_sam_header_once(tmp_path):
    single = _run_single(tmp_path, ["--sam"])
    merged = _run_cluster(2, tmp_path, ["--sam"])
    assert merged == single
    assert merged.count("@PG") == 1


def test_compute_host_ranges_properties(tmp_path):
    """Byte-balanced contiguous split: covers every record exactly once,
    in file order, for host counts exceeding the record count too."""
    import numpy as np

    from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer
    from sigfish_tpu.parallel.distributed import compute_host_ranges

    p = str(tmp_path / "r.blow5")
    rng = np.random.default_rng(5)
    sizes = [10, 5000, 20, 3000, 40, 60, 2500, 8]  # wildly uneven
    with Slow5Writer(p, header_data=[{}]) as w:
        for i, n in enumerate(sizes):
            w.write_record(
                Slow5Record(
                    read_id=f"r{i}", read_group=0, digitisation=8192.0,
                    offset=0.0, range=1400.0, sampling_rate=4000.0,
                    raw_signal=rng.integers(-500, 500, n).astype(np.int16),
                )
            )
    with Slow5File(p) as sf:
        for n_hosts in (1, 2, 3, 8, 12):
            ranges = compute_host_ranges(sf, n_hosts)
            assert len(ranges) == n_hosts
            # contiguous, complete, in order
            pos = 0
            for r in ranges:
                assert r.rec_start == pos
                pos += r.n_records
            assert pos == len(sizes)
            # each non-empty range seeks to a decodable record boundary
            for r in ranges:
                if r.n_records:
                    sf.seek_record(r.file_offset, r.rec_start)
                    rec = sf.decode_record(sf.read_next_blob())
                    assert rec.read_id == f"r{r.rec_start}"


def test_multiprocess_rna_byte_identical(tmp_path):
    """RNA through the distributed runtime: polyA autodetect, truncated
    3'-end tracks, negative ref_st_offset coordinates and the RNA query
    reversal all survive the per-host range split + ordered merge."""
    fa = "/root/reference/test/rnasequin_sequences_2.4.fa"
    bl = "/root/reference/test/sequin_rna.blow5"
    extra = ["--rna", "-q", "500", "-p", "-1"]

    out = str(tmp_path / "single_rna.paf")
    r = subprocess.run(
        [sys.executable, "-m", "sigfish_tpu.cli", "dtw", fa, bl, "-o", out]
        + extra,
        env=_env(), capture_output=True, cwd="/root/repo", timeout=900,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    single = open(out).read()

    outs = [str(tmp_path / f"rh{i}.paf") for i in range(2)]
    _run_cluster_files(2, fa, bl, outs, extra)
    assert open(outs[0]).read() == single
    assert len(single.splitlines()) == 8


def test_streaming_gather_multichunk_window(tmp_path):
    """Force tiny gather chunks + a 2-chunk credit window so the merge
    exercises multi-chunk streaming with flow control; output must stay
    byte-identical to the single-process run."""
    single = _run_single(tmp_path, [])
    outs = [str(tmp_path / f"wh{i}.paf") for i in range(2)]
    old = {k: os.environ.get(k) for k in
           ("SIGFISH_GATHER_CHUNK", "SIGFISH_GATHER_WINDOW")}
    os.environ["SIGFISH_GATHER_CHUNK"] = "128"
    os.environ["SIGFISH_GATHER_WINDOW"] = "2"
    try:
        _run_cluster_files(2, FA, BL, outs, [])
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert open(outs[0]).read() == single


def test_gather_timeout_diagnoses_dead_peer(tmp_path):
    """Failure detection: when a peer joins the cluster but never
    contributes (crash analogue), host 0's gather must fail within the
    configured timeout naming the missing peer -- not stall forever."""
    port = _free_port()
    env = _env()
    env["SIGFISH_GATHER_TIMEOUT_MS"] = "10000"
    common = (
        "from sigfish_tpu.parallel.distributed import ("
        "init_distributed, gather_ordered_stream);"
        f"init_distributed('localhost:{port}', 2, %d);"
    )
    # peer: init, then exit without ever publishing its body
    peer = subprocess.Popen(
        [sys.executable, "-c", common % 1 + "import os; os._exit(0)"],
        env=env, stderr=subprocess.PIPE, cwd="/root/repo",
    )
    # host 0 hard-exits on the failure like the CLI does: the jax atexit
    # shutdown barrier would otherwise block on the dead peer
    h0 = subprocess.Popen(
        [
            sys.executable, "-c",
            common % 0
            + "import io, os, sys, tempfile, traceback;"
            "b = tempfile.TemporaryFile();"
            "out = io.StringIO();"
            "exc = None\n"
            "try:\n"
            "    gather_ordered_stream(b, out, 0, 2)\n"
            "except RuntimeError as e:\n"
            "    traceback.print_exc(); sys.stderr.flush(); os._exit(3)\n"
            "os._exit(0)",
        ],
        env=env, stderr=subprocess.PIPE, cwd="/root/repo",
    )
    _, err0 = h0.communicate(timeout=300)
    peer.wait(timeout=60)
    assert h0.returncode != 0
    msg = err0.decode()
    assert "timed out" in msg and "host 1" in msg, msg[-800:]


def test_mid_run_peer_death_fails_fast(tmp_path):
    """A peer dying MID-RUN (after draining its first batch, not at
    init) must make host 0 exit nonzero within the gather timeout with
    the dead peer named -- the crash analogue the init-time test above
    cannot cover. No retry: a hang or an unnamed failure here is a
    product bug, not scheduler flake."""
    port = _free_port()
    outs = [str(tmp_path / f"h{i}.paf") for i in range(3)]
    procs = []
    for i in range(3):
        env = _env()
        env["SIGFISH_GATHER_TIMEOUT_MS"] = "15000"
        if i == 2:
            # host 2 crashes after its first drained batch (-K 1 forces
            # multiple batches per host so the death is genuinely mid-run)
            env["SIGFISH_TPU_DIE_AFTER_BATCH"] = "1"
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "sigfish_tpu.cli", "dtw", FA, BL,
                    "--hosts", "3", "--host-id", str(i),
                    "--coordinator", f"localhost:{port}",
                    "-K", "1", "-o", outs[i],
                ],
                env=env, stderr=subprocess.PIPE, cwd="/root/repo",
            )
        )
    errs, rcs = [], []
    for p in procs:
        _, err = p.communicate(timeout=300)  # fail-fast, not a hang
        errs.append(err.decode())
        rcs.append(p.returncode)
    assert rcs[2] == 9, f"fault injection did not fire: {errs[2][-500:]}"
    assert rcs[0] != 0, "host 0 exited 0 despite a dead peer"
    assert "host 2" in errs[0] and "timed out" in errs[0], errs[0][-800:]
