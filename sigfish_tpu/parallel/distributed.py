"""Multi-host distributed runtime: jax.distributed + per-host BLOW5
record ranges + deterministic ordered PAF emission.

The reference's only scale layer is a single-process pthread pool
(ref: src/thread.c:119 work_db); this module is the TPU-native
replacement (SURVEY §2.3/§7-step-7): N independent host processes form a
jax.distributed cluster, each maps a *contiguous, byte-balanced* range
of the BLOW5 records on its local devices (reads are data-parallel; the
synthesized reference tracks are replicated per host -- they are tiny,
SURVEY §5), and host 0 emits the merged PAF/SAM.

Because the ranges are contiguous and in file order, the merged output
(host 0's lines, then host 1's, ...) is byte-identical to a
single-process run -- no interleave bookkeeping, no nondeterminism.
The end-of-run gather goes through the jax.distributed coordination
service's key-value store, so it needs no shared filesystem and no
cross-host XLA collectives (the per-read pipeline itself has none when
tracks are replicated: the dp axis across hosts is embarrassingly
parallel, exactly like the reference's per-read work items).

Record ranges come from one index pass (io/blow5_idx.py, cached as the
binary-compatible ``.idx`` sidecar): each host seeks straight to its
range start instead of scanning the file.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass


@dataclass
class HostRange:
    """Contiguous record range [rec_start, rec_start+n_records) with the
    file offset of the first record (for Slow5File.seek_record)."""

    rec_start: int
    n_records: int
    file_offset: int


def init_distributed(
    coordinator: str, num_processes: int, process_id: int
) -> None:
    """Join the jax.distributed cluster (idempotent).

    coordinator: "host:port" of process 0. All processes must call this
    before any other JAX API touches the backend.
    """
    import jax

    if num_processes <= 1:
        return
    # idempotence check must NOT touch the backend (jax.process_count()
    # would initialize it, defeating the purpose) -- peek at the
    # coordination-service client instead
    from jax._src import distributed as _dist

    if _dist.global_state.client is None:
        # generous timeouts: on an oversubscribed host a peer process can
        # be starved of CPU for minutes (observed under concurrent test
        # load); the defaults (300 s init / 100 s heartbeat) then fail a
        # healthy cluster
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=600,
            heartbeat_timeout_seconds=600,
        )


def _kv_client():
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        raise RuntimeError(
            "jax.distributed is not initialized; call init_distributed first"
        )
    return client


def compute_host_ranges(sf, n_hosts: int) -> list[HostRange]:
    """Byte-balanced contiguous split of a Slow5File's records.

    One index pass (reusing/creating the .idx sidecar); split points are
    chosen so every host's byte total approximates total/n_hosts, like
    the reference's -B batching balances by bytes (sigfish.c:283-301).
    """
    idx = sf.index_load()
    entries = sorted(
        (idx.get(rid) for rid in idx.ids()), key=lambda e: e[0]
    )  # (offset, size) in file order
    n = len(entries)
    total = sum(sz for _, sz in entries)
    ranges: list[HostRange] = []
    start = 0
    cum = 0
    for h in range(n_hosts):
        target = total * (h + 1) / n_hosts
        end = start
        while end < n and (h == n_hosts - 1 or cum + entries[end][1] <= target
                           or end == start):
            cum += entries[end][1]
            end += 1
        ranges.append(
            HostRange(
                rec_start=start,
                n_records=end - start,
                file_offset=entries[start][0] if start < n else 0,
            )
        )
        start = end
    return ranges


_GATHER_PREFIX = "sigfish_tpu/gather"
_gather_round = [0]


def _gather_timeout_ms(default: int = 600_000) -> int:
    """SIGFISH_GATHER_TIMEOUT_MS overrides how long a host waits for a
    peer's contribution before declaring it dead (failure detection:
    without a bound, one crashed peer stalls the whole cluster)."""
    import os

    return int(os.environ.get("SIGFISH_GATHER_TIMEOUT_MS", default))


def _blocking_get(client, key: str, timeout_ms: int, what: str) -> str:
    """blocking_key_value_get with a diagnosis instead of a raw gRPC
    DEADLINE_EXCEEDED: names the missing peer so a crashed/hung host is
    identifiable from host 0's error output."""
    try:
        return client.blocking_key_value_get(key, timeout_ms)
    except Exception as e:
        raise RuntimeError(
            f"distributed gather timed out after {timeout_ms} ms waiting "
            f"for {what} (key {key!r}): a peer process has likely "
            f"crashed or hung; its range was NOT merged"
        ) from e


def gather_ordered(data: bytes, process_id: int, num_processes: int,
                   timeout_ms: int | None = None) -> bytes | None:
    """All hosts contribute bytes; host 0 returns them concatenated in
    host order, others return None.

    Uses the coordination-service KV store (no shared FS, no XLA
    collectives), chunked to stay well under gRPC message limits.
    """
    if timeout_ms is None:
        timeout_ms = _gather_timeout_ms()
    client = _kv_client()
    rnd = _gather_round[0]
    _gather_round[0] += 1
    chunk = 2 * 1024 * 1024  # pre-base64 chunk size
    nchunks = (len(data) + chunk - 1) // chunk if data else 0
    client.key_value_set(
        f"{_GATHER_PREFIX}/{rnd}/{process_id}/nchunks", str(nchunks)
    )
    for c in range(nchunks):
        blob = data[c * chunk : (c + 1) * chunk]
        client.key_value_set(
            f"{_GATHER_PREFIX}/{rnd}/{process_id}/{c}",
            base64.b64encode(blob).decode("ascii"),
        )
    if process_id != 0:
        # wait until host 0 confirms the merge so the KV entries stay
        # alive long enough
        _blocking_get(client, f"{_GATHER_PREFIX}/{rnd}/done",
                      timeout_ms, "host 0's merge confirmation")
        return None
    parts: list[bytes] = []
    for h in range(num_processes):
        key = f"{_GATHER_PREFIX}/{rnd}/{h}/nchunks"
        nc = int(_blocking_get(client, key, timeout_ms,
                               f"host {h}'s chunk count"))
        _kv_delete(client, key)
        for c in range(nc):
            key = f"{_GATHER_PREFIX}/{rnd}/{h}/{c}"
            parts.append(
                base64.b64decode(
                    _blocking_get(client, key, timeout_ms,
                                  f"host {h}'s chunk {c}")
                )
            )
            # free each chunk as it is consumed: the coordination
            # service otherwise retains every host's full (base64)
            # payload until cluster shutdown -- at multi-GB output
            # scale that is an OOM on host 0
            _kv_delete(client, key)
    client.key_value_set(f"{_GATHER_PREFIX}/{rnd}/done", "1")
    return b"".join(parts)


def _kv_delete(client, key: str) -> None:
    """Best-effort KV delete (API name varies across jax versions)."""
    for name in ("key_value_delete", "key_value_dir_delete"):
        fn = getattr(client, name, None)
        if fn is not None:
            try:
                fn(key)
            except Exception:
                pass
            return


def gather_ordered_stream(
    body_fp,
    out_fp,
    process_id: int,
    num_processes: int,
    timeout_ms: int | None = None,
    chunk: int | None = None,
    window: int | None = None,
) -> None:
    """Stream every host's body file into ``out_fp`` on host 0, in host
    order, with bounded memory on every node.

    ``body_fp`` is each host's own output as a seekable *binary* file
    (disk-backed, so a host never holds its full output in RAM).
    Host 0 writes its own body straight to ``out_fp`` (no KV round
    trip), then drains peers in host order, deleting each chunk as it
    lands. Peers publish base64 chunks under a credit window: chunk c
    goes up only after host 0 acknowledged chunk c-window, so the
    coordination service holds at most ~window chunks per peer at any
    moment instead of the whole payload. Output bytes are ASCII
    (PAF/SAM), so chunk-boundary decoding is safe.

    Env overrides (mainly for tests): SIGFISH_GATHER_CHUNK bytes,
    SIGFISH_GATHER_WINDOW chunks.
    """
    import os

    if chunk is None:
        chunk = int(os.environ.get("SIGFISH_GATHER_CHUNK", 2 * 1024 * 1024))
    if window is None:
        window = int(os.environ.get("SIGFISH_GATHER_WINDOW", 8))
    # chunk=0 divides by zero; window=0 deadlocks every peer on an ack
    # host 0 can never write (peer waits for chunk -window..-1 acks)
    chunk = max(1, chunk)
    window = max(1, window)
    if timeout_ms is None:
        timeout_ms = _gather_timeout_ms()
    client = _kv_client() if num_processes > 1 else None
    rnd = _gather_round[0]
    _gather_round[0] += 1
    pre = f"{_GATHER_PREFIX}/s{rnd}"

    body_fp.seek(0, 2)
    size = body_fp.tell()
    body_fp.seek(0)
    nchunks = (size + chunk - 1) // chunk if size else 0

    if process_id != 0:
        client.key_value_set(f"{pre}/{process_id}/nchunks", str(nchunks))
        for c in range(nchunks):
            if c >= window:
                ack = f"{pre}/ack/{process_id}/{c - window}"
                _blocking_get(client, ack, timeout_ms,
                              "host 0's flow-control ack")
                _kv_delete(client, ack)
            blob = body_fp.read(chunk)
            client.key_value_set(
                f"{pre}/{process_id}/{c}",
                base64.b64encode(blob).decode("ascii"),
            )
        _blocking_get(client, f"{pre}/done", timeout_ms,
                      "host 0's merge confirmation")
        return

    while True:
        blob = body_fp.read(chunk)
        if not blob:
            break
        out_fp.write(blob.decode())
    for h in range(1, num_processes):
        key = f"{pre}/{h}/nchunks"
        nc = int(_blocking_get(client, key, timeout_ms,
                               f"host {h}'s chunk count"))
        _kv_delete(client, key)
        for c in range(nc):
            key = f"{pre}/{h}/{c}"
            out_fp.write(
                base64.b64decode(
                    _blocking_get(client, key, timeout_ms,
                                  f"host {h}'s chunk {c}")
                ).decode()
            )
            _kv_delete(client, key)
            client.key_value_set(f"{pre}/ack/{h}/{c}", "1")
    if client is not None:
        client.key_value_set(f"{pre}/done", "1")


def shutdown_distributed() -> None:
    """Coordinated cluster disconnect before process exit.

    ``client.shutdown()`` is a cluster-wide barrier: the coordination
    service waits for every task's shutdown call, then acknowledges, so
    each task's heartbeat + error-polling threads stop *before* host 0
    tears the service down.  (An ad-hoc KV barrier followed by process
    exit is insufficient -- host 0's teardown races the peers' polling
    threads, whose C++ error handler aborts the whole process.)
    Idempotent no-op when the cluster was never initialized.
    """
    import jax

    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        jax.distributed.shutdown()


def gather_counters(
    counters: dict[str, int], process_id: int, num_processes: int
) -> dict[str, int] | None:
    """Sum integer counters across hosts; host 0 gets the totals,
    other hosts get None. Newline-framed so the concatenated gather
    splits cleanly per host."""
    payload = (
        ",".join(f"{k}={v}" for k, v in sorted(counters.items())) + "\n"
    )
    merged = gather_ordered(payload.encode(), process_id, num_processes)
    if merged is None:
        return None
    totals = dict.fromkeys(counters, 0)
    for host_line in merged.decode().splitlines():
        for kv in host_line.split(","):
            if kv:
                k, v = kv.split("=")
                totals[k] = totals.get(k, 0) + int(v)
    return totals
