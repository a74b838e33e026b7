"""The dtw pipeline: stream BLOW5 batches, map on device, emit PAF/SAM.

Stage decomposition mirrors the reference's per-read pipeline
(work_per_single_read, src/sigfish.c:995-1001) but splits host/device:

  load_db       host   sequential raw-record fetch (src/sigfish.c:274)
  parse/event/
  normalise     host   per read, embarrassingly parallel (thread pool /
                       C++ ext), ref parse_single/event_single/
                       normalise_single (sigfish.c:317-505)
  sDTW +
  candidates    DEVICE batched wavefront sDTW (Pallas; lax.scan engine as
                       fallback) over all (contig,strand) tracks for the
                       whole read batch, with the window-argmin + top-5
                       candidate reduction fused on device
                       (ops/sdtw_pallas.py + ops/candidates_dev.py) --
                       replacing the reference's per-read per-contig
                       scalar DP + host scan (sigfish.c:870-964)
  backtrack/
  output        host   winner path recompute (native C++) + PAF/SAM
                       strings in batch order (sigfish.c:1051)

The reference's pthread work-stealing (src/thread.c) maps to: host stages
on a thread pool, overlapped with device time by the double-buffered
batch loop; device stage batched data-parallel (and sharded over a
(dp, tp) Mesh, see parallel/).
"""

from __future__ import annotations

import concurrent.futures as _fut
import os
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..io.blow5 import Slow5File, Slow5Record
from ..models.genref import RefSynth, gen_ref
from ..models.pore_model import (
    MODEL_ID_DNA_R10,
    MODEL_ID_DNA_R9,
    MODEL_ID_RNA_R9,
    MODEL_ID_RNA_RNA004,
    PoreModel,
    load_builtin_model,
    read_model_tsv,
)
from ..ops import jnn
from ..ops.candidates import compute_mapq, rank_candidates, window_argmin
from ..ops.candidates_dev import (
    build_column_maps,
    device_topk_candidates,
    device_window_top5,
    unpack_top5,
)
from ..ops.events import DNA_PARAMS, RNA_PARAMS, get_events, get_events_prefix
from ..ops.sdtw import make_query_batch, pad_tracks, sdtw_scan
from ..ops.sdtw_pallas import (
    effective_td,
    prepare_wavefront_inputs,
    sdtw_wavefront,
    shift_queries_for_clip,
)
from ..ops.sdtw_ref import path_to_map, subsequence_cost_seeded, subsequence_path
from ..output import paf_line, sam_line
from ..utils import log_info, log_verbose, log_warning

PORE_R9 = 0
PORE_R10 = 1
PORE_RNA004 = 2


@dataclass
class Options:
    """User options. ref: opt_t sigfish.h:121-139 + init_opt sigfish.c:1122-1144."""

    batch_size: int = 512
    batch_size_bytes: int = 20 * 1000 * 1000
    num_thread: int = 8
    prefix_size: int = 50
    query_size: int = 250
    rna: bool = False
    dtw_std: bool = False
    invert: bool = False
    secondary: bool = False
    full_ref: bool = False
    from_end: bool = False
    sam: bool = False
    pore: str | None = None  # None = auto
    pore_flag: int = PORE_R9
    model_file: str | None = None
    debug_break: int = -1
    profile: bool = False
    ckpt: int = 512
    use_pallas: bool | None = None  # legacy --accel: True=pallas, False=scan
    engine: str | None = None  # None=auto | "pallas" | "scan" | "native"
    mesh: str | None = None  # "DPxTP" device mesh, e.g. "4x2"; None = 1 device
    shard_id: int = 0   # multi-host record stripe I of N
    n_shards: int = 1
    # multi-host contiguous record range: stop after this many records
    # (the host seeked to its range start via Slow5File.seek_record)
    rec_limit: int | None = None
    # "host" (default) runs eventization on the host (native C++ /
    # prefix-bounded); "device" batches raw signals through the JAX
    # eventizer (ops/events_device.py) -- the scaling path for
    # PCIe-attached hosts where the host stages bound RNA throughput
    host_stages: str = "host"
    # reference-axis chunking on the single-device wavefront path:
    # 0 = auto (chunk once the diag score buffer would exceed
    # ops/chunked_ref.CHUNK_AUTO_COLS columns -- multi-megabase contigs),
    # -1 = never, > 0 = force, with ~this many diagonals per segment
    # (tests use small values to exercise the fold on tiny references)
    ref_chunk: int = 0


@dataclass
class BatchStats:
    n_rec: int = 0
    sum_bytes: int = 0
    prefix_fail: int = 0
    ignored: int = 0
    too_short: int = 0


class Core:
    """Static state. ref: core_t sigfish.h:202-244 + init_core sigfish.c:81-207."""

    def __init__(self, fasta_path: str, slow5_path: str, opt: Options):
        self.opt = opt
        if opt.host_stages == "device":
            # the device eventizer's t-stat chain is f64 by contract
            # (events.c:297-368); detect_events_batch scopes x64 to its
            # own trace (jax.enable_x64 context) -- enabling it globally
            # breaks every gridded Pallas kernel in the process (Mosaic
            # rejects the i64 index maps / roll shifts x64 produces)
            pass
        elif opt.host_stages != "host":
            raise SystemExit(f"unknown --host-stages {opt.host_stages!r}")
        self.sf = Slow5File(slow5_path)

        # --- auto-detection from the SLOW5 header
        # ref: drna_detect / pore_detect sigfish.c:27-77,118-135
        exp = self.sf.header_get("experiment_type", 0)
        if exp is None:
            log_warning("experiment_type not found in SLOW5 header. Assuming genomic_dna")
        elif exp == "rna" and not opt.rna:
            opt.rna = True
            log_verbose("Detected RNA data. --rna was set automatically.")
        elif exp not in ("genomic_dna", "rna"):
            log_warning(f"Unknown experiment type: {exp}. Assuming genomic_dna")
        for g in range(1, self.sf.num_read_groups):
            curr = self.sf.header_get("experiment_type", g)
            if exp is not None and curr != exp:
                log_warning(
                    f"Experiment type mismatch: {curr} != {exp} in read "
                    f"group {g}. Defaulted to {exp}"
                )

        if opt.pore is None:
            kit = self.sf.header_get("sequencing_kit", 0)
            if kit is None:
                log_warning("sequencing_kit not found in SLOW5 header. Assuming R9.4.1")
            elif "114" in kit:
                opt.pore_flag = PORE_R10
                log_verbose("Detected R10 data. --pore r10 was set automatically.")
                if opt.rna:
                    raise SystemExit("R10 RNA data does not exist! But header indicates R10 RNA.")
            elif "rna004" in kit:
                opt.pore_flag = PORE_RNA004
                log_verbose("Detected RNA004 data. --pore rna004 was set automatically.")
            for g in range(1, self.sf.num_read_groups):
                curr = self.sf.header_get("sequencing_kit", g)
                if kit is not None and curr != kit:
                    log_warning(
                        f"sequencing_kit type mismatch: {curr} != {kit} in "
                        f"read group {g}. Defaulted to {kit}"
                    )
        else:
            opt.pore_flag = {"r9": PORE_R9, "r10": PORE_R10, "rna004": PORE_RNA004}[opt.pore]

        # samples-per-event estimate for the prefix-bounded eventization
        # fast path (_prepare_read_prefix); EMA-refined from real reads
        # (placed after auto-detection so opt.rna is final)
        self._dwell_ema = 22.0 if opt.rna else 10.0
        import threading as _threading

        self._dwell_lock = _threading.Lock()

        # --- model
        if opt.model_file:
            self.model: PoreModel = read_model_tsv(opt.model_file)
        else:
            if opt.rna:
                mid = MODEL_ID_RNA_RNA004 if opt.pore_flag == PORE_RNA004 else MODEL_ID_RNA_R9
                log_info(
                    "builtin RNA004 nucleotide model loaded"
                    if opt.pore_flag == PORE_RNA004
                    else "builtin RNA R9 nucleotide model loaded"
                )
            else:
                mid = MODEL_ID_DNA_R10 if opt.pore_flag == PORE_R10 else MODEL_ID_DNA_R9
                log_info(
                    "builtin DNA R10 nucleotide model loaded"
                    if opt.pore_flag == PORE_R10
                    else "builtin DNA R9 nucleotide model loaded"
                )
            self.model = load_builtin_model(mid)
        self.kmer_size = self.model.kmer_size

        # --- synthesized reference
        self.ref: RefSynth = gen_ref(
            fasta_path,
            self.model,
            rna=opt.rna,
            full_ref=opt.full_ref,
            from_end=opt.from_end,
            invert=opt.invert,
            query_size=opt.query_size,
        )

        # --- device track layout: contig-major, '+' then '-' per contig
        # (candidate insertion order decides ties, ref sigfish.c:870-964)
        tracks: list[np.ndarray] = []
        self.track_meta: list[tuple[int, str]] = []  # (rid, strand)
        for j in range(self.ref.num_ref):
            tracks.append(self.ref.forward[j])
            self.track_meta.append((j, "+"))
            if self.ref.reverse is not None:
                tracks.append(self.ref.reverse[j])
                self.track_meta.append((j, "-"))

        # engine: Pallas wavefront on TPU; on CPU-only hosts the native
        # C++ two-row DP (the reference's own execution model, threaded)
        # beats CPU-XLA by orders of magnitude; lax.scan is the portable
        # third engine and semantics oracle
        from .. import native as _native

        if opt.engine:
            self.engine = opt.engine
        elif opt.use_pallas is True:
            self.engine = "pallas"
        elif opt.use_pallas is False:
            self.engine = "scan"
        elif jax.default_backend() == "tpu":
            self.engine = "pallas"
        elif _native.available():
            self.engine = "native"
        else:
            self.engine = "scan"
        self.use_pallas = self.engine == "pallas"
        # off-TPU the wavefront engine runs the Pallas interpreter
        # (CPU dry runs / ring-on-both-engines checks); same numerics,
        # no Mosaic compile
        self.wf_interpret = self.use_pallas and jax.default_backend() != "tpu"
        self.pad_q = max(128, ((opt.query_size + 127) // 128) * 128)
        # tile width for every wavefront launch this Core makes:
        # wide-query kernels drop to td=128 (effective_td -- the
        # Q=512 td=256 cold compile measured 935 s for +1.8% rate)
        self.wf_td = effective_td(self.pad_q)
        self._wf_cache: dict[int, tuple] = {}
        self._wf_chunk_cache: dict[tuple, tuple] = {}

        self.tracks = tracks
        self.track_sizes = [t.size for t in tracks]
        W = max(opt.query_size, 1)

        self.mesh = None
        self.mesh_mode = None
        if opt.mesh:
            dp_s, tp_s = opt.mesh.lower().split("x")
            n_dp, n_tp = int(dp_s), int(tp_s)
            n_dev = n_dp * n_tp
            if n_dev > 1 and len(tracks) < n_tp:
                # too few tracks for whole-track partitioning (e.g. a
                # single --full-ref contig): ring mode splits by COLUMNS
                # and pipelines the DP carry around the tp ring
                # (parallel/shard.ring_fullref_lastrow). All devices go
                # on the tp axis.
                import math as _math

                from ..parallel import make_mesh

                self.mesh = make_mesh(1, n_dev)
                self.mesh_mode = "ring"
                n_tp = n_dev
                ref_cat, reset, offsets = pad_tracks(tracks, ckpt=opt.ckpt, align=W)
                unit = opt.ckpt * W // _math.gcd(opt.ckpt, W)
                if self.use_pallas:
                    # the wavefront kernel tiles diagonals in WF_TD
                    # chunks (sdtw_pallas: D % td == 0): segment widths
                    # must also be WF_TD-aligned or an odd --ckpt/-q
                    # combo trips the kernel's assert at trace time
                    _wftd = self.wf_td
                    unit = unit * _wftd // _math.gcd(unit, _wftd)
                # + pad_q: the wavefront ring needs >= lane (= W-1) PAD
                # diagonals after the last real column to flush its
                # emissions (parallel/shard.ring_fullref_lastrow_wavefront)
                per = -(-(ref_cat.shape[0] + self.pad_q) // n_tp)
                Rs = ((per + unit - 1) // unit) * unit
                # sub-chunking (chunked-ref composed with --mesh): each
                # ring step streams the shard segment in Ds = Rs/n_sub
                # diagonal sub-chunks through the carry kernel, folding
                # into the per-window accumulator -- per-device memory
                # stays O(Bm*Ds + B*Rs/W) no matter the contig size.
                # n_sub must divide Rs/unit so Ds stays lcm(W, td[,ckpt])
                # aligned; --ref-chunk > 0 forces ~that many diagonals
                # per sub-chunk, else auto-chunk once a segment would
                # exceed CHUNK_AUTO_COLS (same policy as single-device)
                self.ring_n_sub = 1
                if self.use_pallas and opt.ref_chunk >= 0:
                    from ..ops.chunked_ref import CHUNK_AUTO_COLS

                    target = (
                        opt.ref_chunk if opt.ref_chunk > 0 else CHUNK_AUTO_COLS
                    )
                    if opt.ref_chunk > 0 or Rs > CHUNK_AUTO_COLS:
                        m_units = Rs // unit
                        best = 1
                        for d in range(1, m_units + 1):
                            if m_units % d == 0 and abs(
                                Rs // d - target
                            ) < abs(Rs // best - target):
                                best = d
                        self.ring_n_sub = best
                R_ring = n_tp * Rs
                pad_ref = np.full(R_ring, 1.0e18, dtype=np.float32)
                pad_ref[: ref_cat.shape[0]] = ref_cat
                pad_reset = np.zeros(R_ring, dtype=bool)
                pad_reset[: reset.shape[0]] = reset
                if ref_cat.shape[0] < R_ring:
                    pad_reset[ref_cat.shape[0]] = True
                ref_cat, reset = pad_ref, pad_reset
                self.shard_Rs = Rs
                self.ring_ref_dev = jnp.asarray(ref_cat.reshape(n_tp, Rs))
                # each ring engine reads exactly one reset layout: bool
                # for the scan carry, f32 for the wavefront kernel --
                # only upload the one the selected engine uses
                if self.use_pallas:
                    self.ring_rspad_dev = jnp.asarray(
                        reset.reshape(n_tp, Rs).astype(np.float32)
                    )
                else:
                    self.ring_reset_dev = jnp.asarray(reset.reshape(n_tp, Rs))
            elif n_dev > 1:
                from ..parallel import make_mesh, shard_tracks
                from ..ops.sdtw_pallas import prepare_wavefront_inputs as _pwf

                self.mesh = make_mesh(n_dp, n_tp)
                self.mesh_mode = "tracks"
                sref, sreset, soffs, assign = shard_tracks(
                    tracks, n_tp, ckpt=opt.ckpt, align=W
                )
                Rs = sref.shape[1]
                self.shard_Rs = Rs
                # gathered layout (shard-major = original track order,
                # because the partition is contiguous)
                ref_cat = sref.reshape(-1)
                reset = sreset.reshape(-1)
                g_starts = np.zeros(len(tracks), dtype=np.int64)
                for s, a in enumerate(assign):
                    for li, gi in enumerate(a):
                        g_starts[gi] = s * Rs + soffs[s, li]
                offsets = np.concatenate([g_starts, [n_tp * Rs]])
                # each engine reads one input pair inside sharded_engine
                # (wavefront: ypad/rspad; scan: ref/reset) -- build and
                # upload only the selected engine's pair, with (n_tp, 1)
                # placeholders for the other so the shard_map signature
                # is unchanged
                if self.use_pallas:
                    # per-shard wavefront inputs at the fixed padded Q
                    yps, rps = [], []
                    D = 0
                    for s in range(n_tp):
                        yp, rp, d = _pwf(
                            sref[s], sreset[s], self.pad_q,
                            td=self.wf_td,
                        )
                        yps.append(yp[0])
                        rps.append(rp[0])
                        D = max(D, d)
                    ypad = np.full((n_tp, D), 1.0e18, dtype=np.float32)
                    rspad = np.zeros((n_tp, D), dtype=np.float32)
                    for s in range(n_tp):
                        ypad[s, : yps[s].size] = yps[s]
                        rspad[s, : rps[s].size] = rps[s]
                        if rps[s].size < D:
                            rspad[s, rps[s].size] = 1.0
                    self.shard_ref_dev = jnp.zeros((n_tp, 1), jnp.float32)
                    self.shard_reset_dev = jnp.zeros((n_tp, 1), bool)
                    self.shard_ypad_dev = jnp.asarray(ypad)
                    self.shard_rspad_dev = jnp.asarray(rspad)
                else:
                    self.shard_ref_dev = jnp.asarray(sref)
                    self.shard_reset_dev = jnp.asarray(sreset)
                    self.shard_ypad_dev = jnp.zeros((n_tp, 1), jnp.float32)
                    self.shard_rspad_dev = jnp.zeros((n_tp, 1), jnp.float32)

        if self.mesh is None:
            # align every track segment to the query size so the device-
            # side candidate windows are a static reshape
            # (ops/candidates_dev.py)
            ref_cat, reset, offsets = pad_tracks(tracks, ckpt=opt.ckpt, align=W)

        self.ref_cat = ref_cat
        self.reset = reset
        self.track_offsets = offsets
        self.ref_cat_dev = jnp.asarray(ref_cat)
        self.reset_dev = jnp.asarray(reset)

        # static column maps for on-device candidate extraction
        u_map, valid_map = build_column_maps(
            offsets, ref_cat.shape[0], track_sizes=self.track_sizes
        )
        self.u_dev = jnp.asarray(u_map)
        self.valid_dev = jnp.asarray(valid_map)
        self.valid_host = valid_map
        if self.mesh is not None and self.mesh_mode == "tracks":
            # per-shard views for the shard-local candidate reductions
            # (sharded_engine_topk): gathered layout is shard-major, so
            # the global maps reshape straight into (n_tp, Rs)
            self.u_sh_dev = jnp.asarray(u_map.reshape(-1, self.shard_Rs))
            self.valid_sh_dev = jnp.asarray(
                valid_map.reshape(-1, self.shard_Rs)
            )
        elif self.mesh is not None and self.mesh_mode == "ring":
            # per-shard valid masks for the ring top-k engines. The
            # wavefront's per-shard blocks are DIAG-indexed (diag d =
            # column d - lane), so its mask is the column mask shifted
            # by lane -- computed globally here so a shard boundary
            # never truncates it; the scan engine reads columns directly
            Rs_r = self.shard_Rs
            R_ring = ref_cat.shape[0]
            n_tp_r = R_ring // Rs_r
            if self.use_pallas:
                lane_r = W - 1
                vd = np.zeros(R_ring, dtype=bool)
                vd[lane_r:] = valid_map[: R_ring - lane_r]
                # real columns must all have an emission diagonal inside
                # the layout (guaranteed by the +pad_q sizing above)
                assert not valid_map[R_ring - lane_r :].any()
                self.ring_vdiag_dev = jnp.asarray(vd.reshape(n_tp_r, Rs_r))
            else:
                self.ring_vcol_dev = jnp.asarray(
                    valid_map.reshape(n_tp_r, Rs_r)
                )

        # counters (ref core_t)
        self.total_reads = 0
        self.sum_bytes = 0
        self.prefix_fail = 0
        self.ignored = 0
        self.too_short = 0
        self.load_db_time = 0.0
        self.process_db_time = 0.0
        self.output_time = 0.0
        self.parse_time = 0.0
        self.event_time = 0.0
        self.normalise_time = 0.0
        self.dtw_time = 0.0

        self._pool: _fut.ThreadPoolExecutor | None = None
        if opt.num_thread > 1:
            self._pool = _fut.ThreadPoolExecutor(max_workers=opt.num_thread)

    def sdtw_std_corners(
        self, qb: np.ndarray, qlens: np.ndarray, onehot: np.ndarray
    ) -> np.ndarray:
        """--dtw-std on device engines: per-track corner cells gathered
        ON DEVICE, so (B, ntracks) crosses the host link instead of the
        full (B, R) last-row matrix (320 MB at RNA scale over the ~11
        MB/s axon link). ref sigfish.c:914-925: std DTW contributes one
        candidate per track, its boundary-anchored corner cell.

        Engine routing: pallas runs the boundary-anchored wavefront
        kernel (sdtw_wavefront std=True) -- BYTE-EXACT vs the scalar
        oracle (min is rounding-exact and the anchored first-row adds
        run in the scalar DP's column order), unlike the lax.scan
        engine whose prefix-min reassociation carries a documented
        +-ulp drift (fuzz seeds 3003/3031). Clipped reads ride the
        same query shift as the subsequence path. std is RNA-only so
        references are small; a >CHUNK_AUTO_COLS reference (no such
        workload exists in practice) routes to the exact native host
        path rather than materializing the one-shot buffer."""
        if getattr(self, "_std_corner_cols", None) is None:
            offs = self.track_offsets
            self._std_corner_cols = np.array(
                [
                    int(offs[t]) + max(int(self.track_sizes[t]), 1) - 1
                    for t in range(len(self.tracks))
                ],
                np.int32,
            )
        if self.use_pallas:
            from ..ops.chunked_ref import CHUNK_AUTO_COLS

            W = self.opt.query_size
            Q = qb.shape[1]
            if self.ref_cat.shape[0] + Q > CHUNK_AUTO_COLS:
                return self._native_std_corners(qb, qlens)
            # the per-Q pad cache serves std too (same layout; Q is
            # pad_q on every production call) -- rebuilding/re-uploading
            # the (1, D) pads per batch costs ~2 s over the remote link
            # at large D
            if Q not in self._wf_cache:
                ypad_h, rspad_h, D = prepare_wavefront_inputs(
                    self.ref_cat, self.reset, Q, td=self.wf_td
                )
                if len(self._wf_cache) >= 2:
                    self._wf_cache.pop(next(iter(self._wf_cache)))
                self._wf_cache[Q] = (
                    jnp.asarray(ypad_h), jnp.asarray(rspad_h), D
                )
            ypad_d, rspad_d, D = self._wf_cache[Q]
            qb_k, fs = shift_queries_for_clip(qb, qlens, W - 1)
            ds = sdtw_wavefront(
                jnp.asarray(qb_k), ypad_d, rspad_d,
                lane=W - 1, td=self.wf_td,
                start_lanes=jnp.asarray(fs), std=True,
                interpret=self.wf_interpret,
            )
            # diag-indexed: column c emits at diagonal c + lane
            cols = jnp.asarray(self._std_corner_cols + np.int32(W - 1))
            return np.asarray(jnp.take(ds, cols, axis=1))
        lr = sdtw_scan(
            jnp.asarray(qb),
            jnp.asarray(onehot),
            self.ref_cat_dev,
            self.reset_dev,
            ckpt=self.opt.ckpt,
            std=True,
        )
        return np.asarray(
            jnp.take(lr, jnp.asarray(self._std_corner_cols), axis=1)
        )

    def sdtw_candidates(
        self, qb: np.ndarray, qlens: np.ndarray, onehot: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full device path: sDTW engine + fused on-device window-argmin /
        top-5 (ops/candidates_dev.py). Only (B, 5) scores + positions cross
        the host link for full-length reads; clipped reads (qlen != W) get
        a per-read host window scan on their extracted last row.
        Returns (top_scores, top_pos_global), both (B, 5)."""
        return self.sdtw_candidates_collect(
            self.sdtw_candidates_submit(qb, qlens, onehot)
        )

    def sdtw_candidates_collect(self, handle) -> tuple[np.ndarray, np.ndarray]:
        """Block on a submitted device computation; run host fallbacks."""
        if "parts" in handle:
            outs = [self.sdtw_candidates_collect(h) for h in handle["parts"]]
            return (
                np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]),
            )
        if handle.get("native"):
            return handle["top_s"], handle["top_p"]
        if "packed4" in handle:
            # mesh engines: one (B, 4k) fetch carrying both the uniform-
            # window top-5 and the per-read-window top-5 (clipped reads)
            B = handle["B"]
            buf = np.asarray(handle["packed4"][:B])
            ts, tp = unpack_top5(buf[:, :10])
            qlens = handle["qlens"]
            W = self.opt.query_size
            rows = np.where((qlens > 0) & (qlens != W))[0]
            if rows.size:
                cs, cp = unpack_top5(buf[rows, 10:])
                ts[rows] = cs
                tp[rows] = cp
            return ts, tp
        B = handle["B"]
        if handle.get("packed") is None:
            # clip-only submission (every live row clipped): no main
            # pass ran; the clip entries below fill every real row
            ts = np.full((B, 5), np.float32(3.0e38), np.float32)
            tp = np.full((B, 5), -1, np.int32)
        else:
            # one packed (B, 2k) f32 fetch: device->host round-trip
            # latency dominates per-batch cost, so scores+positions
            # ride one buffer
            ts, tp = unpack_top5(np.asarray(handle["packed"][:B]))
        if "clip_packed" in handle:
            cs, cp = unpack_top5(np.asarray(handle["clip_packed"]))
            rows = handle["clip_rows"]
            ts[rows] = cs[: rows.size]
            tp[rows] = cp[: rows.size]
        elif "clip_dev" in handle:
            # chunked-ref mode: clipped reads ride the one-shot kernel +
            # device clip pass as small sub-batches. Dispatch is
            # SEQUENTIAL: group i+1 submits only after group i's results
            # are fetched (and its device buffers released), bounding
            # concurrent HBM to ~one group PER BATCH regardless of
            # clipped count (double-buffering can overlap two batches'
            # groups -- see the _CLIP_ONESHOT_BYTES sizing note).
            for ent in handle["clip_dev"]:
                grp, sub, qb_c, qlens_c, oh_c, kw = ent
                if sub is None:
                    sub = self.sdtw_candidates_submit(
                        qb_c, qlens_c, oh_c, **kw
                    )
                cs, cp = self.sdtw_candidates_collect(sub)
                ent[1] = ent[2] = ent[3] = ent[4] = None  # release refs
                ts[grp] = cs[: grp.size]
                tp[grp] = cp[: grp.size]
        elif "clip_host" in handle:
            # chunked-ref mode fallback: clipped reads from the exact
            # host per-read path (possibly as thread-pool futures) --
            # only when even one one-shot row would bust the buffer
            # budget (D beyond ~270M columns)
            for i, r in enumerate(handle["clip_rows"]):
                res = handle["clip_host"][i]
                s5, p5 = res.result() if hasattr(res, "result") else res
                ts[r] = s5
                tp[r] = p5
        return ts, tp

    def _clip_pass(
        self, handle: dict, lr, qlens: np.ndarray, qlens_dev, R: int, W: int,
        diag_lane: int | None = None,
    ) -> None:
        """Second device pass for clipped reads (every device path):
        `lr` holds their correct per-read qlen-1 rows (scan:
        onehot-selected; wavefront: shift_queries_for_clip), so this
        only re-derives the qlen-wide candidate windows. The
        single-device wavefront hands in its raw diag-indexed scores
        with diag_lane=W-1; the column slice is applied AFTER the row
        take so only the clipped rows are materialized (the mesh/ring
        engines emit column-indexed (B, R) rows already)."""
        clip_rows = np.where((qlens > 0) & (qlens != W))[0]
        if not clip_rows.size:
            return
        bc = 1
        while bc < clip_rows.size:
            bc *= 2  # power-of-2 row buckets bound recompiles
        rows_pad = np.zeros(bc, dtype=np.int32)
        rows_pad[: clip_rows.size] = clip_rows
        rows_dev = jnp.asarray(rows_pad)
        sub = jnp.take(lr, rows_dev, axis=0)
        if diag_lane is not None:
            sub = jax.lax.slice_in_dim(sub, diag_lane, diag_lane + R, axis=1)
        cpacked = device_topk_candidates(
            sub, jnp.take(qlens_dev, rows_dev), self.u_dev, self.valid_dev,
            R, W=W, k=5, reindex=False, pack=True,
        )
        _start_host_copy(cpacked)
        handle["clip_rows"] = clip_rows
        handle["clip_packed"] = cpacked

    # max device batch rows per kernel launch: B=512 x Q<=512 fits the
    # 16 MB scoped-VMEM budget of the wavefront kernel; larger -K loads
    # are split into sub-launches. B=1024 measured +17% kernel rate at
    # Q=256 (per-step overheads amortize over sublanes, DESIGN §1) and
    # still fits VMEM, but doubles the cold Mosaic compile -- and both
    # chemistries are host-bound e2e, so the default stays 512; tune
    # via SIGFISH_TPU_DEVICE_CHUNK on kernel-bound deployments.
    DEVICE_CHUNK = int(os.environ.get("SIGFISH_TPU_DEVICE_CHUNK", "512"))

    def sdtw_candidates_submit(
        self, qb: np.ndarray, qlens: np.ndarray, onehot: np.ndarray,
        n_live: int | None = None, force_oneshot: bool = False,
        single_device: bool = False,
    ) -> dict:
        """Dispatch the device computation asynchronously; returns a
        handle for sdtw_candidates_collect. Lets the caller overlap the
        next batch's host stages with this batch's device time. n_live =
        number of leading real rows (the rest are bucket padding; the
        native engine skips them, device engines get them for free).
        force_oneshot bypasses the chunked-reference routing -- used by
        the chunked path itself to serve its clipped sub-batches through
        the one-shot kernel + device clip pass (the small row count
        makes the (rows, D) buffer affordable even when (B, D) is not).
        single_device bypasses the mesh branches -- the ring mode's
        clipped-read sub-batches route here (their per-read window
        grids straddle ring shard boundaries), picking one-shot vs
        chunked by reference size as usual."""
        # a force_oneshot sub-batch is by definition single-device: the
        # chunked path's clip groups must never re-enter a mesh branch
        # (ring -> clip sub -> chunked -> clip group -> ring recursed
        # forever under --mesh + forced --ref-chunk; fuzz seed 52007)
        single_device = single_device or force_oneshot
        if self.engine == "native" and self.mesh is None:
            return self._native_candidates_submit(qb, qlens, n_live)
        if (
            self.mesh is not None and self.mesh_mode == "ring"
            and not single_device
        ):
            from ..parallel.shard import ring_topk_scan, ring_topk_wavefront

            B = qb.shape[0]
            W = self.opt.query_size
            n_micro = min(B, 32)
            while B % n_micro:
                n_micro -= 1  # must divide the batch exactly
            if self.use_pallas:
                # clipped reads ride the carry kernel's uniform lane via
                # the same query shift as the single-device path (exact
                # DP values; their per-read windows are served below)
                qb_k, fs_lanes = shift_queries_for_clip(qb, qlens, W - 1)
                out = ring_topk_wavefront(
                    jnp.asarray(qb_k), jnp.asarray(fs_lanes),
                    self.ring_ref_dev, self.ring_rspad_dev,
                    self.ring_vdiag_dev,
                    self.mesh, n_micro=n_micro, lane=W - 1, W=W,
                    Rs=self.shard_Rs, n_sub=self.ring_n_sub,
                    td=self.wf_td, interpret=self.wf_interpret,
                )
            else:
                out = ring_topk_scan(
                    jnp.asarray(qb), jnp.asarray(onehot),
                    self.ring_ref_dev, self.ring_reset_dev,
                    self.ring_vcol_dev,
                    self.mesh, n_micro=n_micro, W=W, Rs=self.shard_Rs,
                    ckpt=self.opt.ckpt,
                )
            _start_host_copy(out)
            handle = dict(packed=out, qlens=qlens, B=B, clipped_done=True)
            clip_rows = np.where((qlens > 0) & (qlens != W))[0]
            if clip_rows.size:
                # per-read window grids straddle ring shard boundaries:
                # serve clipped reads through the single-device
                # machinery (one-shot or chunked by size) as one small
                # sub-batch, spliced back in at collect
                bc = 1
                while bc < clip_rows.size:
                    bc *= 2
                Q = qb.shape[1]
                qb_c = np.zeros((bc, Q), dtype=qb.dtype)
                qb_c[: clip_rows.size] = qb[clip_rows]
                oh_c = np.zeros((bc, Q), np.float32)
                oh_c[: clip_rows.size] = onehot[clip_rows]
                # pad rows carry qlen 0 (not W): the chunked route can
                # then see "every live row is clipped" and skip its
                # uniform-window main sweep outright
                qlens_c = np.zeros(bc, dtype=qlens.dtype)
                qlens_c[: clip_rows.size] = qlens[clip_rows]
                sub = self.sdtw_candidates_submit(
                    qb_c, qlens_c, oh_c, single_device=True
                )
                handle["clip_dev"] = [
                    [clip_rows, sub, None, None, None, None]
                ]
            return handle
        B = qb.shape[0]
        # the split applies to single_device sub-batches too (ring clip
        # sub-batches with mesh set would otherwise launch an un-split
        # B > DEVICE_CHUNK kernel past the scoped-VMEM budget)
        if (self.mesh is None or single_device) and B > self.DEVICE_CHUNK:
            C = self.DEVICE_CHUNK
            parts = [
                self.sdtw_candidates_submit(
                    qb[o : o + C], qlens[o : o + C], onehot[o : o + C],
                    force_oneshot=force_oneshot,
                    single_device=single_device,
                )
                for o in range(0, B, C)
            ]
            return dict(parts=parts, B=B, qlens=qlens)
        R = self.ref_cat.shape[0]
        W = self.opt.query_size
        qlens_dev = jnp.asarray(qlens.astype(np.int32))
        if self.mesh is not None and not single_device:
            from ..parallel import sharded_engine_topk

            n_dp = self.mesh.shape["dp"]
            B = qb.shape[0]
            if self.use_pallas:
                # wavefront branch: shift clipped queries to the uniform
                # emitted lane (the scan branch reads the unshifted
                # layout via onehot and never sees qb when use_pallas)
                qb, _ = shift_queries_for_clip(qb, qlens, W - 1)
            padb = (-B) % n_dp
            if padb:
                qb = np.pad(qb, ((0, padb), (0, 0)))
                onehot = np.pad(onehot, ((0, padb), (0, 0)))
                qlens_pad = np.pad(qlens.astype(np.int32), (0, padb),
                                   constant_values=max(W, 1))
            else:
                qlens_pad = qlens.astype(np.int32)
            # per-shard top-5 + O(B*k) allgather/merge on device --
            # clipped reads are served in the same pass (the per-read-
            # window list), so no second device pass and nothing O(R)
            # on the collective
            out = sharded_engine_topk(
                jnp.asarray(qb), jnp.asarray(onehot), jnp.asarray(qlens_pad),
                self.shard_ref_dev, self.shard_reset_dev,
                self.shard_ypad_dev, self.shard_rspad_dev,
                self.u_sh_dev, self.valid_sh_dev,
                self.mesh, Rs=self.shard_Rs, lane=W - 1,
                ckpt=self.opt.ckpt, td=self.wf_td,
                use_pallas=self.use_pallas,
                clip_shift=self.use_pallas, interpret=self.wf_interpret,
            )
            _start_host_copy(out)
            return dict(packed4=out, qlens=qlens, B=B, clipped_done=True)
        clip_rows = np.where((qlens > 0) & (qlens != W))[0]
        if self.use_pallas and self.opt.ref_chunk >= 0 and not force_oneshot:
            from ..ops.chunked_ref import CHUNK_AUTO_COLS

            if self.opt.ref_chunk > 0 or R + qb.shape[1] > CHUNK_AUTO_COLS:
                return self._chunked_candidates_submit(qb, qlens, clip_rows)
        if self.use_pallas:
            Q = qb.shape[1]
            if Q not in self._wf_cache:
                ypad_h, rspad_h, D = prepare_wavefront_inputs(
                    self.ref_cat, self.reset, Q, td=self.wf_td
                )
                # device-resident FOR THE LIFE OF THE CORE: re-uploading
                # the (1, D) pads per call is invisible for small refs
                # but costs ~2 s/call over the remote link at a
                # 5M-column reference (the chunked path's clip
                # sub-batches hit this every batch). This retention is
                # part of the chunked-mode HBM budget: 2 x 4D bytes per
                # Q key (~0.7 GB x 2 at the largest clip-servable D).
                # Q is core.pad_q on every production call, so one key
                # exists in practice; the eviction below bounds the
                # pathological case (distinct Q widths) at two keys.
                # Benign race: drain thread (lazy clip submits) and main
                # thread may both populate -- last write wins, both
                # values are identical uploads.
                if len(self._wf_cache) >= 2:
                    self._wf_cache.pop(next(iter(self._wf_cache)))
                self._wf_cache[Q] = (
                    jnp.asarray(ypad_h), jnp.asarray(rspad_h), D
                )
            ypad, rspad, D = self._wf_cache[Q]
            if clip_rows.size:
                # clipped reads ride the kernel's uniform emitted lane
                # by shifting their query up to end at lane W-1 (the
                # free-start lane moves with it via start_lanes); their
                # last rows come out column-indexed in the same static
                # slice as everyone else's (ops/sdtw_pallas.py)
                qb_k, fs_lanes = shift_queries_for_clip(qb, qlens, W - 1)
            else:
                qb_k, fs_lanes = qb, None
            scores = sdtw_wavefront(
                jnp.asarray(qb_k),
                jnp.asarray(ypad),
                jnp.asarray(rspad),
                lane=W - 1,
                td=self.wf_td,
                start_lanes=None if fs_lanes is None else jnp.asarray(fs_lanes),
                interpret=self.wf_interpret,
            )
            reindex = True
        else:
            scores = sdtw_scan(
                jnp.asarray(qb),
                jnp.asarray(onehot),
                self.ref_cat_dev,
                self.reset_dev,
                ckpt=self.opt.ckpt,
                std=False,
            )
            reindex = False
        packed = device_window_top5(
            scores, qlens_dev, self.valid_dev, R, W=W, k=5, reindex=reindex,
            pack=True,
        )
        _start_host_copy(packed)
        handle = dict(
            packed=packed, qlens=qlens, B=qb.shape[0], clipped_done=True
        )
        # clipped reads (qlen != W): second device pass with per-read
        # dynamic window widths (segmented scan) instead of an O(R*qlen)
        # host DP per read (ref sigfish.c:457-461 short-read semantics).
        # Scan engine: its (B, R) scores are per-read qlen-1 rows
        # (onehot-selected) already. Wavefront engine: the
        # shift_queries_for_clip prep above lands every clipped read's
        # last row on the SAME uniform W-1 lane as full-length reads, so
        # _clip_pass's diag_lane slice extracts the column layout and
        # only re-derives the qlen-wide windows. (An earlier clip pass
        # read the un-shifted wavefront scores -- a garbage lane for
        # clipped rows; caught by the pallas-engine fuzz leg, seeds
        # 9004/9005.)
        self._clip_pass(
            handle, scores, qlens, qlens_dev, R, W,
            diag_lane=W - 1 if self.use_pallas else None,
        )
        return handle

    def _chunked_candidates_submit(
        self, qb: np.ndarray, qlens: np.ndarray, clip_rows: np.ndarray
    ) -> dict:
        """Reference-axis chunked wavefront (ops/chunked_ref.py): the
        carry kernel streams Ds-diagonal segments through one lax.scan,
        folding each into a per-window (min, first-pos) accumulator, so
        a multi-megabase contig never materializes the (B, D) score
        buffer (10 GB at 5M columns / B=512 -- past v5e HBM; the
        reference's own O(q*r) malloc is the same cliff, sigfish.c:873).
        Bit-identical to the one-shot kernel + device_window_top5.

        Clipped reads (qlen != W) use per-read window grids that don't
        fold across segments. They are served by the ONE-SHOT kernel +
        device clip pass on a small sub-batch: a (rows, D) score buffer
        is affordable precisely because clipped reads are few (32 rows x
        5.2M columns = 0.7 GB where the full (512, D) buffer is 10.7 GB),
        and the existing clip machinery is exact + oracle-verified.
        Groups are sized to _CLIP_ONESHOT_BYTES; only a batch whose
        clipped rows exceed every group budget falls back to the exact
        host per-read DP (_clipped_top5) on the thread pool -- the
        reference's own cost model (sigfish.c:873), kept as the
        unconditionally-correct backstop."""
        from ..ops.chunked_ref import (
            prepare_chunked_inputs,
            sdtw_wavefront_chunked_top5,
        )
        W = self.opt.query_size
        B, Q = qb.shape
        WF_TD = self.wf_td
        clip_host = None
        clip_dev = None
        if clip_rows.size:
            R_cols = self.ref_cat.shape[0]
            D_one = ((R_cols + Q + WF_TD - 1) // WF_TD) * WF_TD
            # per-group row cap: a dispatched group holds THREE rows-by-D
            # scale buffers at peak -- the one-shot scores (rows, D), the
            # clip pass's eager row-take copy (rows, D), and its column
            # slice (rows, R)
            max_rows = int(_CLIP_ONESHOT_BYTES // (3 * 4 * D_one))
            pw = 1
            while pw * 2 <= max_rows:
                pw *= 2
            if max_rows >= 1:
                # Groups are dispatched ONE AT A TIME: only the first is
                # submitted here (it overlaps this batch's remaining host
                # work); the rest dispatch lazily in collect, each after
                # the previous group's buffers are consumed -- an eager
                # loop would hold every group's (rows, D) allocation
                # concurrently (16 groups x 0.7 GB at 512 clipped reads
                # on a 5.2M-column reference = HBM OOM).
                clip_dev = []
                for o in range(0, clip_rows.size, pw):
                    grp = clip_rows[o : o + pw]
                    bc = 1
                    while bc < grp.size:
                        bc *= 2
                    qb_c = np.zeros((bc, Q), dtype=qb.dtype)
                    qb_c[: grp.size] = qb[grp]
                    qlens_c = np.full(bc, W, dtype=qlens.dtype)
                    qlens_c[: grp.size] = qlens[grp]
                    sub = None
                    oh_c = np.zeros((bc, Q), np.float32)
                    if o == 0:
                        sub = self.sdtw_candidates_submit(
                            qb_c, qlens_c, oh_c, force_oneshot=True,
                        )
                        qb_c = qlens_c = oh_c = None
                    clip_dev.append(
                        [grp, sub, qb_c, qlens_c, oh_c,
                         dict(force_oneshot=True)]
                    )
            else:
                queries = [qb[r, : int(qlens[r])].copy() for r in clip_rows]
                if self._pool is not None:
                    clip_host = [
                        self._pool.submit(self._clipped_top5, q)
                        for q in queries
                    ]
                else:
                    clip_host = [self._clipped_top5(q) for q in queries]
        if clip_rows.size and clip_rows.size == int(
            np.count_nonzero(qlens > 0)
        ):
            # EVERY live row is clipped (the ring mesh's clip sub-batch
            # arrives exactly like this): the uniform-window main fold's
            # results would be overwritten row for row at collect --
            # skip the whole chunked sweep; the clip entries below
            # serve every real row (packed=None tells collect to start
            # from an empty base)
            handle = dict(packed=None, qlens=qlens, B=B, clipped_done=True)
            handle["clip_rows"] = clip_rows
            if clip_dev is not None:
                handle["clip_dev"] = clip_dev
            else:
                handle["clip_host"] = clip_host
            return handle
        key = (Q, self.opt.ref_chunk)
        if key not in self._wf_chunk_cache:
            target = self.opt.ref_chunk if self.opt.ref_chunk > 0 else 32768
            yps, rps, vs, _, nwin_tot = prepare_chunked_inputs(
                self.ref_cat, self.reset, self.valid_host, Q, W,
                td=self.wf_td, target=target,
            )
            self._wf_chunk_cache[key] = (
                jnp.asarray(yps), jnp.asarray(rps), jnp.asarray(vs), nwin_tot
            )
        yps, rps, vs, nwin_tot = self._wf_chunk_cache[key]
        packed = sdtw_wavefront_chunked_top5(
            jnp.asarray(qb), yps, rps, vs,
            lane=W - 1, W=W, nwin_tot=nwin_tot, td=self.wf_td,
            interpret=self.wf_interpret,
        )
        _start_host_copy(packed)
        handle = dict(packed=packed, qlens=qlens, B=B, clipped_done=True)
        if clip_rows.size:
            handle["clip_rows"] = clip_rows
            if clip_dev is not None:
                handle["clip_dev"] = clip_dev
            else:
                handle["clip_host"] = clip_host
        return handle

    def _native_candidates_submit(
        self, qb: np.ndarray, qlens: np.ndarray, n_live: int | None = None
    ) -> dict:
        """CPU engine: per-read native two-row DP over every track (the
        reference's execution model, threaded -- native calls release
        the GIL) + the host window scan. Bit-exact scalar order."""
        from .. import native

        B = qb.shape[0]
        n = B if n_live is None else min(n_live, B)
        R = self.ref_cat.shape[0]
        top_s = np.full((B, 5), np.float32(3.0e38))
        top_p = np.full((B, 5), -1, dtype=np.int64)

        def one(slot: int):
            qlen = int(qlens[slot])
            if qlen <= 0:
                return
            q = qb[slot, :qlen]
            lr = np.full(R, np.float32(3.0e38))
            for t, track in enumerate(self.tracks):
                lo = int(self.track_offsets[t])
                if track.size:
                    row = native.subsequence_lastrow(
                        q, track, out=lr[lo : lo + track.size]
                    )
                    if row is None:  # native lib unavailable: exact oracle
                        from ..ops.sdtw_ref import subsequence_cost as _py_sub

                        lr[lo : lo + track.size] = np.asarray(
                            _py_sub(q, track)
                        )[-1]
            s5, p5 = self._host_top5(lr, qlen)
            top_s[slot] = s5
            top_p[slot] = p5

        if self._pool is not None and n > 1:
            list(self._pool.map(one, range(n)))
        else:
            for slot in range(n):
                one(slot)
        # the native engine runs each read at its own qlen (clipped reads
        # included) -- no host fallback pass needed
        return dict(
            native=True, top_s=top_s, top_p=top_p, qlens=qlens, B=B,
            clipped_done=True,
        )

    def _native_std_corners(
        self, qb: np.ndarray, qlens: np.ndarray, n_live: int | None = None
    ) -> np.ndarray:
        """--dtw-std scoring on the CPU engine: per-(read, track) corner
        cell of the boundary-anchored DTW (ref sigfish.c:914-925), in
        the reference's exact scalar op order (native two-row DP;
        threaded -- native calls release the GIL)."""
        from .. import native

        B = qb.shape[0]
        n = B if n_live is None else min(n_live, B)
        nt = len(self.tracks)
        corners = np.full((B, nt), np.float32(3.0e38))

        def one(slot: int):
            qlen = int(qlens[slot])
            if qlen <= 0:
                return
            q = qb[slot, :qlen]
            for t, track in enumerate(self.tracks):
                if track.size:
                    row = native.std_lastrow(q, track)
                    if row is None:  # native lib unavailable: exact oracle
                        from ..ops.sdtw_ref import std_dtw_cost

                        row = np.asarray(std_dtw_cost(q, track))[-1]
                    corners[slot, t] = row[-1]

        if self._pool is not None and n > 1:
            list(self._pool.map(one, range(n)))
        else:
            for slot in range(n):
                one(slot)
        return corners

    def _clipped_top5(self, query: np.ndarray):
        """Exact last row over every track for one clipped read (native
        two-row DP; Python-oracle fallback), then the host window scan."""
        from .. import native
        from ..ops.sdtw_ref import subsequence_cost as _py_sub

        R = self.ref_cat.shape[0]
        lr = np.full(R, np.float32(3.0e38))
        for t, track in enumerate(self.tracks):
            lo = int(self.track_offsets[t])
            if not track.size:
                continue
            row = native.subsequence_lastrow(query, track)
            if row is None:
                row = np.asarray(_py_sub(query, track))[-1]
            lr[lo : lo + track.size] = row
        return self._host_top5(lr, query.size)

    def _host_top5(self, lr_row: np.ndarray, qlen: int):
        """Window scan + update_aln top-5 for one read (exact reference
        semantics, arbitrary window width)."""
        cand_s: list[float] = []
        cand_p: list[int] = []
        for t in range(len(self.tracks)):
            lo = int(self.track_offsets[t])
            size = self.track_sizes[t]
            mins, args = window_argmin(lr_row[lo : lo + size], qlen)
            cand_s.extend(mins.tolist())
            cand_p.extend((args + lo).tolist())
        s = np.asarray(cand_s, dtype=np.float32)
        p = np.asarray(cand_p, dtype=np.int64)
        out_s = np.full(5, np.float32(3.0e38))
        out_p = np.full(5, -1, dtype=np.int64)
        for k in range(min(5, s.size)):
            rev = s[::-1]
            best = s.size - 1 - int(np.argmin(rev))  # later wins ties
            out_s[k] = s[best]
            out_p[k] = p[best]
            s[best] = np.float32(np.inf)
        return out_s, out_p

    def close(self) -> None:
        self.sf.close()
        if self._pool:
            self._pool.shutdown()


@dataclass
class ReadWork:
    """Per-read transient state (one slot of db_t, ref sigfish.h:161-197)."""

    rec: Slow5Record | None = None
    event_start: np.ndarray | None = None
    event_length: np.ndarray | None = None
    event_mean: np.ndarray | None = None
    n_events: int = 0
    qstart: int = 0
    qend: int = 0
    query: np.ndarray | None = None  # z-scored (and RNA-reversed) slice
    pa: np.ndarray | None = None  # cached pA conversion (to_pa is pure)
    out: str | None = None
    skip: bool = False  # len_raw_signal==0 or ignored
    # per-read counter flags, tallied by the main thread (avoids races)
    flag_prefix_fail: bool = False
    flag_ignored: bool = False
    flag_too_short: bool = False
    # --host-stages device: polyA end precomputed on device
    # (ops/jnn_device.py); None = not computed, -1 = computed + failed
    device_py: int | None = None


def _parse_single(core: Core, blob: bytes) -> ReadWork:
    """ref: parse_single sigfish.c:317-328."""
    w = ReadWork()
    w.rec = core.sf.decode_record(blob)
    if w.rec.len_raw_signal <= 0:
        w.skip = True
    return w


def _event_single(core: Core, w: ReadWork) -> ReadWork:
    """ref: event_single sigfish.c:330-378 (pA conversion + getevents)."""
    if w.skip:
        return w
    if w.pa is None:
        w.pa = w.rec.to_pa()
    pa = w.pa
    et = get_events(pa, rna=core.opt.rna)
    w.event_start = et.start
    w.event_length = et.length
    w.event_mean = et.mean.copy()
    w.n_events = et.n
    if et.n <= 0:
        w.skip = True
    return w


def _normalise_single(core: Core, w: ReadWork, py: int | None = None) -> ReadWork:
    """ref: normalise_single sigfish.c:424-505 (query window + z-score).

    py: optional precomputed polyA-end sample index (the raw-signal half
    of detect_query_start) so the fast path's fallback does not redo the
    adaptor/polyA scans; None = compute here, -1 = computed and failed."""
    if w.skip:
        return w
    opt = core.opt
    rec = w.rec
    et_start = w.event_start
    n = w.n_events
    if not opt.from_end:
        start_idx = opt.prefix_size
        if opt.prefix_size < 0:
            # pA samples are only needed by the polyA autodetect
            if w.pa is None:
                w.pa = rec.to_pa()
            if py is None:
                py = jnn.detect_polya_end(
                    rec.raw_signal, w.pa, pore=opt.pore_flag
                )
            if py < 0:
                start_idx = -1
            else:
                # first event with start >= py, linear first-match
                # (ref sigfish.c:405-411)
                ge = np.nonzero(et_start.astype(np.int64) >= py)[0]
                start_idx = int(ge[0]) if ge.size else -1
            if start_idx < 0:
                w.flag_prefix_fail = True
                start_idx = 50  # fall back, ref sigfish.c:440-447
        end_idx = start_idx + opt.query_size
        if start_idx + 25 > n:  # min query size 25, ref sigfish.c:450-456
            w.skip = True
            w.flag_ignored = True
            return w
        if end_idx > n:
            end_idx = n
            w.flag_too_short = True
    else:
        start_idx = n - opt.prefix_size - opt.query_size
        end_idx = n - opt.prefix_size
        if start_idx < 0:
            start_idx = 0
            w.flag_too_short = True
        if end_idx < 0:
            w.skip = True
            w.flag_ignored = True
            return w

    if end_idx <= start_idx:
        # empty query window (from-end with n_events == prefix, or
        # -q 0): the reference's behavior here is undefined -- a 0-row
        # DP matrix whose uninitialized last row feeds the candidate
        # scan (it aborts on such inputs, fuzz seed 31025). Count the
        # read as ignored and keep going (PARITY.md Robustness).
        w.skip = True
        w.flag_ignored = True
        return w

    return _finish_normalise(core, w, int(start_idx), int(end_idx))


def _finish_normalise(core: Core, w: ReadWork, start_idx: int, end_idx: int) -> ReadWork:
    """Window z-score + RNA reversal given the decided query window.

    ref sigfish.c:479-502 (shared by the exact path and the
    prefix-bounded fast path -- identical math on identical inputs)."""
    w.qstart = start_idx
    w.qend = end_idx

    # z-score the slice, float32 population stats in the reference's
    # sequential accumulation order (ref sigfish.c:483-502)
    from .. import native

    sl = np.ascontiguousarray(w.event_mean[start_idx:end_idx], np.float32)
    if native.zscore_inplace(sl):
        sl_norm = sl
    else:
        num = np.float32(end_idx - start_idx)
        mean = np.float32(sl.sum(dtype=np.float32) / num)
        var = np.float32(np.sum((sl - mean) * (sl - mean), dtype=np.float32) / num)
        stdv = np.float32(np.sqrt(var))
        sl_norm = (sl - mean) / stdv
    w.event_mean[start_idx:end_idx] = sl_norm

    qlen = end_idx - start_idx
    if core.opt.rna and not core.opt.invert:
        w.query = sl_norm[::-1].copy()  # reversed query, ref sigfish.c:860-867
    else:
        w.query = sl_norm.copy()
    assert w.query.size == qlen
    return w


# kill switch for the prefix-bounded eventization fast path (exact full
# path always remains the fallback and the --profile-cpu stage mode)
_NO_PREFIX_EVENTS = bool(os.environ.get("SIGFISH_TPU_NO_PREFIX_EVENTS"))

# chunked-ref mode: byte budget for serving a batch's CLIPPED reads
# through the one-shot kernel (scores (rows, D) + the clip pass's
# (rows, R) slice live together). The bound is PER BATCH: run_dtw
# double-buffers, so batch N's lazily-dispatched clip groups (collect
# thread) can overlap batch N+1's eagerly-submitted group 0 -- worst
# case 2x this budget of clip buffers live at once, plus two batches'
# chunked main-pass buffers. 2 GB x 2 = 4 GB worst case => 32-row
# groups at a 5.2M-column reference -- still small next to v5e's 16 GB
# HBM, huge next to the host per-read DP it replaces (~1.3 s/read at
# that scale).
_CLIP_ONESHOT_BYTES = 2 << 30

# --host-stages device: ceiling on padded (Sb, Bb) eventization plane
# cells. The t-stat chain holds several (S, B) f64 planes live; ~2^25
# cells is the measured safe bound on a 16 GB chip (2^27 crashes).
_DEV_EVENT_CELL_CAP = 1 << 25


def _prepare_read_prefix(core: Core, w: ReadWork) -> ReadWork | None:
    """Prefix-bounded parse->events->normalise for one read.

    The query window only needs events up to qstart + query_size, and
    event detection is a causal left-to-right scan, so eventizing a
    grown signal PREFIX reproduces the leading events bit-exactly
    (ops/events.py detect_events_prefix safety contract: n_safe counts
    events whose closing peak committed before the truncation-affected
    t-stat range). Falls back to the exact full-signal path inline
    (reusing the computed polyA) for clipped/ignored reads or when no
    samples would be saved. Output is bit-identical to the exact path
    by construction; asserted read-by-read in tests/test_events_jnn.py
    and end-to-end by the oracle parity matrix + fuzz.
    """
    opt = core.opt
    rec = w.rec
    if w.pa is None:
        w.pa = rec.to_pa()
    pa = w.pa
    n = pa.size
    rna = opt.rna
    params = RNA_PARAMS if rna else DNA_PARAMS
    w2 = params["window_length2"]
    q = opt.query_size
    if q <= 0:
        # empty query window; the exact path ignores such reads
        return _normalise_single(core, _event_single(core, w))
    need_past_start = max(q, 25)  # covers the ignored(<start+25) and
    # too_short(end>n) decisions: n_events >= start + max(q,25) forces
    # both checks to the not-clipped branch, matching the full run

    if opt.prefix_size >= 0:
        py = -1
        start_known = opt.prefix_size
    else:
        py = jnn.detect_polya_end(rec.raw_signal, pa, pore=opt.pore_flag)
        if py < 0:
            w.flag_prefix_fail = True
            start_known = 50  # ref sigfish.c:440-447 fallback
        else:
            start_known = -1  # first event at/after py, from the table

    # initial samples-per-event guess: per-Core EMA of the measured
    # density (seeded per chemistry), margin 1.3; a short retry refines
    # the bound from the observed event table, so a loose guess costs
    # one extra partial pass, not a 3x overshoot
    dwell = core._dwell_ema
    if start_known >= 0:
        S = int((start_known + need_past_start + 2) * dwell * 1.3)
    else:
        S = py + int((q + 30) * dwell * 1.3)
    S += 4 * w2 + 64
    for _ in range(4):
        if S >= n:
            break
        et, n_safe = get_events_prefix(pa[:S], rna, S - w2)
        if n_safe >= 16:
            starts = et.start[:n_safe].astype(np.int64)
            if start_known < 0:
                # first event with start >= py, linear first-match like
                # the reference (sigfish.c:405-407): a match inside the
                # safe prefix equals the full-table scan's result; no
                # match yet means the answer isn't determinable -- grow
                ge = np.nonzero(starts >= py)[0]
                start_idx = int(ge[0]) if ge.size else -1
            else:
                start_idx = start_known
            needed = (start_idx if start_idx >= 0 else n_safe) + need_past_start
            if start_idx >= 0 and n_safe >= needed:
                # guarded read-modify-write: thread-pool workers update
                # the EMA concurrently and a lost update would make the
                # prefix-size estimate nondeterministic run to run
                with core._dwell_lock:
                    core._dwell_ema = 0.9 * core._dwell_ema + 0.1 * (
                        float(starts[-1]) / n_safe
                    )
                w.event_start = et.start[:n_safe]
                w.event_length = et.length[:n_safe]
                w.event_mean = et.mean[:n_safe].copy()
                w.n_events = n_safe
                return _finish_normalise(core, w, start_idx, start_idx + q)
            # refine the bound from the observed local event density
            k = min(64, n_safe - 1)
            d_loc = float(starts[-1] - starts[-1 - k]) / k
            missing = needed - n_safe + 8
            S = int(starts[-1] + missing * d_loc * 1.3) + 4 * w2 + 64
        else:
            S *= 3
    # exact full-signal path; hand over the polyA result so the
    # adaptor/polyA scans are not repeated
    return _normalise_single(
        core, _event_single(core, w), py=py if opt.prefix_size < 0 else None
    )


def _prepare_read(core: Core, blob: bytes) -> ReadWork:
    """Fused parse + event + normalise for one read (default mode).

    ref: work_per_single_read sigfish.c:995-1001.
    """
    w = _parse_single(core, blob)
    if w.skip:
        return w
    if not _NO_PREFIX_EVENTS and not core.opt.from_end:
        return _prepare_read_prefix(core, w)
    return _normalise_single(core, _event_single(core, w))


def _event_batch_device(core: Core, works: list[ReadWork]) -> None:
    """--host-stages device: eventize the whole batch on the device
    (ops/events_device.py) instead of per-read on the host. Fills
    event_start/length/mean/n_events in place; reads overflowing the
    device event cap fall back to the exact host path. Output-identical
    to _event_single wherever the backend's f64 is IEEE (the CPU
    backend; see the module docstring for the TPU caveat)."""
    from ..ops.events_device import detect_events_batch

    idx = [i for i, w in enumerate(works) if not w.skip]
    # Ultra-long reads whose padded signal ALONE exceeds the ~2^25-cell
    # device ceiling (plus the E=S/4 peaks buffer) go to the exact host
    # path: even a Bb=1 launch would OOM the chip on them.
    long_idx = [
        i for i in idx if works[i].rec.len_raw_signal > _DEV_EVENT_CELL_CAP
    ]
    for i in long_idx:
        _event_single(core, works[i])
    if long_idx:
        drop = set(long_idx)
        idx = [i for i in idx if i not in drop]
    if not idx:
        return
    # Reads are SORTED by signal length and chunked, and each chunk gets
    # its own power-of-two (S, B) bucket:
    # - the (B, S) i16 upload pads every read to the chunk's S bucket;
    #   batch-max bucketing wastes ~6x link bytes on typical length
    #   mixes (one long read drags 1023 short ones to its pad)
    # - the t-stat chain holds several (S, B) f64 planes live, so
    #   Sb*Bb beyond ~2^25 cells OOMs a 16 GB chip and kills the worker
    #   outright (measured: B=1024 x S=131072 crashes, B=256 runs);
    #   the per-chunk cap enforces that ceiling
    # Compile count stays bounded: a handful of Sb buckets, one Bb each.
    idx.sort(key=lambda i: works[i].rec.len_raw_signal)
    c0 = 0
    while c0 < len(idx):
        S = works[idx[c0]].rec.len_raw_signal
        Sb = 1024
        while Sb < S:
            Sb *= 2
        # Bucket batch cap: Sb*Bb beyond the cell ceiling OOMs the chip,
        # so for long reads max_b drops all the way to 1 (no 64-read
        # floor -- a 4M-sample read at Bb=64 is 2^28 cells, a crash).
        max_b = max(1, _DEV_EVENT_CELL_CAP // Sb)
        # extend while the NEXT read still fits this bucket
        c1 = c0 + 1
        while (
            c1 < len(idx)
            and c1 - c0 < max_b
            and works[idx[c1]].rec.len_raw_signal <= Sb
        ):
            c1 += 1
        chunk = idx[c0:c1]
        c0 = c1
        # Bb floor of 64 bounds the compile count for the common short-
        # read buckets; for large Sb the floor drops with max_b so the
        # padded plane never exceeds the cell ceiling.
        Bb = min(64, max_b)
        while Bb < len(chunk):
            Bb *= 2
        sig = np.zeros((Bb, Sb), np.int16)
        ns = np.zeros(Bb, np.int32)
        digi = np.full(Bb, 1.0)
        off = np.zeros(Bb)
        rng_pa = np.full(Bb, 1.0)
        for r, i in enumerate(chunk):
            rec = works[i].rec
            sig[r, : rec.len_raw_signal] = rec.raw_signal
            ns[r] = rec.len_raw_signal
            digi[r] = rec.digitisation
            off[r] = rec.offset
            rng_pa[r] = rec.range
        tables, _ = detect_events_batch(sig, ns, digi, off, rng_pa, core.opt.rna)
        pys = None
        if (
            core.opt.rna
            and core.opt.prefix_size < 0
            and not core.opt.from_end
        ):
            # device polyA autodetect (ops/jnn_device.py): the last
            # host-bound stage of this mode -- the (B, S) signals are
            # already assembled, only (B,) indices come back
            from ..ops.jnn_device import polya_end_batch

            pys = polya_end_batch(
                sig, ns, digi, off, rng_pa, core.opt.pore_flag
            )
        for r, i in enumerate(chunk):
            w = works[i]
            if pys is not None:
                w.device_py = int(pys[r])
            et = tables[r]
            if et is None:  # device event-cap overflow: exact host fallback
                _event_single(core, w)
                continue
            w.event_start = et.start
            w.event_length = et.length
            w.event_mean = et.mean.copy()
            w.n_events = et.n
            if et.n <= 0:
                w.skip = True


def _backtrack_best(
    core: Core,
    w: ReadWork,
    track_idx: int,
    pos_local: int,
) -> tuple[int, np.ndarray | None]:
    """Recover pos_st (and ref->query-event map for SAM) for the winner.

    Recomputes a *fresh* DP column window ending at the winning column and
    backtracks greedily -- exact because subsequence DTW has a free start
    on the reference axis: DP values at a column only depend on the
    columns its optimal path spans, so a window that contains the winning
    path reproduces the full-matrix values along it. If the path touches
    the window's left edge the window is widened and recomputed. Standard
    DTW (--dtw-std) is boundary-anchored, so its window is always the full
    track prefix. Replaces the reference's O(qlen x rlen) matrix retention
    (src/sigfish.c:873, src/cdtw.c:120).
    """
    opt = core.opt
    track_start = int(core.track_offsets[track_idx])
    pos_global = track_start + pos_local
    qlen = w.query.size

    from .. import native

    span = pos_local + 1 if opt.dtw_std else min(max(2 * qlen, 64), pos_local + 1)
    while True:
        j_lo = pos_global + 1 - span
        ref_cols = core.ref_cat[j_lo : pos_global + 1]
        if native.available():
            res = native.subsequence_backtrack(
                w.query, ref_cols, span - 1, std=opt.dtw_std
            )
            px, py = res
        else:
            cost = subsequence_cost_seeded(w.query, ref_cols, None, std=opt.dtw_std)
            px, py = subsequence_path(cost, span - 1)
        if py[0] == 0 and j_lo > track_start:
            # path touched the recompute window's left edge: widen
            span = min(span * 2, pos_local + 1)
            continue
        break

    pos_st_local = int(py[0]) + (j_lo - track_start)
    r2q = None
    if opt.sam:
        length = pos_local - pos_st_local + 1
        r2q = path_to_map(px, py, length)
    return pos_st_local, r2q


@dataclass
class PendingBatch:
    """A batch whose device work has been dispatched but not collected."""

    works: list
    stats: BatchStats
    live: list
    qlens: np.ndarray | None = None
    handle: dict | None = None
    std_corners: np.ndarray | None = None  # --dtw-std: (B, ntracks) corner cells
    dtw_t0: float = 0.0


def _start_host_copy(arr) -> None:
    """Queue the device->host copy behind the async dispatch so the
    transfer overlaps the next batch's host stages; the blocking
    np.asarray at collect time then finds it (mostly) done."""
    try:
        arr.copy_to_host_async()
    except AttributeError:
        pass


def _pool_map(pool, fn, items, chunk: int = 32):
    """Order-preserving parallel map in chunks: one future per ~chunk
    items instead of one per item (futures overhead is pure Python and
    measurable at 512 reads/batch x 3 stages)."""
    items = list(items)
    if pool is None or len(items) <= chunk:
        return [fn(x) for x in items]
    slices = [items[i : i + chunk] for i in range(0, len(items), chunk)]
    out = pool.map(lambda sl: [fn(x) for x in sl], slices)
    return [y for ch in out for y in ch]


def submit_batch(core: Core, blobs: list[bytes]) -> PendingBatch:
    """Host stages + async device dispatch for one batch of raw records."""
    opt = core.opt
    stats = BatchStats(n_rec=len(blobs), sum_bytes=sum(len(b) for b in blobs))

    # ---- host stages (parallel over reads); --profile-cpu runs them
    # stage-by-stage with per-stage wall-clock accumulation
    # (ref: process_db sigfish.c:1021-1042)
    import time as _time

    def _map(fn, items):
        return _pool_map(core._pool, fn, items)

    if opt.profile:
        t0 = _time.time()
        works = _map(lambda b: _parse_single(core, b), blobs)
        core.parse_time += _time.time() - t0
        t0 = _time.time()
        if opt.host_stages == "device":
            _event_batch_device(core, works)
        else:
            works = _map(lambda w: _event_single(core, w), works)
        core.event_time += _time.time() - t0
        t0 = _time.time()
        works = _map(
            lambda w: _normalise_single(core, w, py=w.device_py), works
        )
        core.normalise_time += _time.time() - t0
        dtw_t0 = _time.time()
    elif opt.host_stages == "device":
        works = _map(lambda b: _parse_single(core, b), blobs)
        _event_batch_device(core, works)
        works = _map(
            lambda w: _normalise_single(core, w, py=w.device_py), works
        )
        dtw_t0 = _time.time()
    else:
        works = _map(lambda b: _prepare_read(core, b), blobs)
        dtw_t0 = _time.time()

    for w in works:
        stats.prefix_fail += w.flag_prefix_fail
        stats.ignored += w.flag_ignored
        stats.too_short += w.flag_too_short

    live = [i for i, w in enumerate(works) if not w.skip]
    pending = PendingBatch(works=works, stats=stats, live=live, dtw_t0=dtw_t0)
    if not live:
        return pending

    # ---- device stage: pad the batch to a bucket size so engines compile
    # once per (B, Q) shape
    queries = [works[i].query for i in live]
    nb = len(queries)
    bucket = 64
    while bucket < nb:
        bucket *= 2
    bucket = min(bucket, max(64, opt.batch_size))
    if core.use_pallas and not core.wf_interpret and nb > 64:
        # on the real TPU a tail batch must ride an ALREADY-COMPILED
        # shape: a fresh bucket (e.g. 224 live reads -> 256 when every
        # full batch ran at 512) triggers a full Mosaic recompile --
        # 13+ s to save ~30 ms of dummy-row compute. Measured: a
        # 12k-read pass read 660 r/s instead of ~3,300 because its
        # last batch alone took 13.3 s. Tiny runs (nb <= 64) keep the
        # small bucket -- they only ever compile one shape anyway.
        # The floor is the shape full batches actually compiled: their
        # bucket, capped at DEVICE_CHUNK off-mesh (larger launches
        # split to DEVICE_CHUNK-row sub-launches).
        full_bucket = 64
        while full_bucket < opt.batch_size:
            full_bucket *= 2
        full_bucket = min(full_bucket, max(64, opt.batch_size))
        if core.mesh is None:
            full_bucket = min(full_bucket, core.DEVICE_CHUNK)
        bucket = max(bucket, full_bucket)
    while len(queries) < bucket:
        # dummy slots carry a full-width zero query so they ride the
        # uniform device candidate path (their results are never read)
        queries.append(np.zeros(max(opt.query_size, 1), dtype=np.float32))
    qb, qlens, onehot = make_query_batch(queries, pad_q=core.pad_q)
    pending.qlens = qlens

    if not opt.dtw_std:
        # fused device path: only (B, 5) candidates cross the host link
        pending.handle = core.sdtw_candidates_submit(qb, qlens, onehot, n_live=nb)
    elif core.engine == "native" and core.mesh is None:
        # --dtw-std on the CPU engine: exact-scalar corner cells (the
        # lax.scan engine's prefix-min reassociates f32 adds -> ulp
        # drift that flips printf digits; fuzz seeds 3003/3031)
        pending.std_corners = core._native_std_corners(qb, qlens, n_live=nb)
    else:
        # device engines: corner cells only (the full (B, R) last-row
        # fetch is link-prohibitive; see sdtw_std_corners)
        pending.std_corners = core.sdtw_std_corners(qb, qlens, onehot)
    return pending


def finish_batch(core: Core, pending: PendingBatch) -> tuple[list[str | None], BatchStats]:
    """Collect device results, backtrack winners, format output lines."""
    import time as _time

    opt = core.opt
    works = pending.works
    stats = pending.stats
    live = pending.live
    if not live:
        if opt.profile:
            core.dtw_time += _time.time() - pending.dtw_t0
        return [None] * len(works), stats
    offs = core.track_offsets
    ntracks = len(core.tracks)

    if not opt.dtw_std:
        top_s, top_p = core.sdtw_candidates_collect(pending.handle)
        # clipped reads (qlen != W): every engine now flags clipped_done
        # (single-device + mesh/ring device clip passes, per-read native
        # DP); this exact-scalar host recompute remains as the fallback
        # contract for any future path that cannot serve them on device
        if not _handle_clipped_done(pending.handle):
            W = opt.query_size
            for slot, i in enumerate(live):
                w = works[i]
                qlen = w.query.size
                if qlen > 0 and qlen != W:
                    s5, p5 = core._clipped_top5(w.query)
                    top_s[slot] = s5
                    top_p[slot] = p5

    # pass 1: winner selection per read (cheap host work)
    winners = []  # (slot, w, t, pos_end_local, d1, d2, rid, strand)
    for slot, i in enumerate(live):
        w = works[i]
        if not opt.dtw_std:
            s0 = float(top_s[slot, 0])
            if top_p[slot, 0] < 0 or s0 >= 1e37:
                w.out = None
                continue
            d1 = s0
            d2 = float(top_s[slot, 1])
            if d2 >= 1e37:
                d2 = float("inf")
            pos_global = int(top_p[slot, 0])
            t = int(np.searchsorted(offs, pos_global, side="right")) - 1
            rid, strand = core.track_meta[t]
            pos_end_local = pos_global - int(offs[t])
        else:
            # single candidate per track: the corner cell
            # ref sigfish.c:914-925
            cand_scores: list[float] = []
            cand_pos: list[int] = []
            cand_track: list[int] = []
            for t in range(ntracks):
                lo = int(offs[t])
                size = core.track_sizes[t]
                if size > 0:
                    s = float(pending.std_corners[slot, t])
                    cand_scores.append(s)
                    cand_pos.append(size - 1)
                    cand_track.append(t)
            best, d1, d2 = rank_candidates(
                np.asarray(cand_scores, dtype=np.float32), np.asarray(cand_pos)
            )
            if best < 0:
                w.out = None
                continue
            t = cand_track[best]
            rid, strand = core.track_meta[t]
            pos_end_local = int(cand_pos[best])
        winners.append((slot, w, t, pos_end_local, d1, d2, rid, strand))

    # pass 2: winner backtracks (native calls release the GIL -> the
    # thread pool parallelizes them on multi-core hosts)
    paths = _pool_map(
        core._pool, lambda a: _backtrack_best(core, a[1], a[2], a[3]), winners
    )

    # pass 3: coordinates + formatting
    for (slot, w, t, pos_end_local, d1, d2, rid, strand), (
        pos_st_local, r2q
    ) in zip(winners, paths):
        # strand flip + RNA offset, ref sigfish.c:971-977
        rlen = core.ref.ref_lengths[rid]
        if strand == "+":
            pos_st, pos_end = pos_st_local, pos_end_local
        else:
            pos_st, pos_end = rlen - pos_end_local, rlen - pos_st_local
        pos_st += core.ref.ref_st_offset[rid]
        pos_end += core.ref.ref_st_offset[rid]

        mapq = compute_mapq(d1, d2)

        # raw index recovery, ref aln_to_str sigfish.c:796-815
        start_ev = w.qstart
        end_ev = w.qend - 1
        start_raw = int(w.event_start[start_ev])
        end_raw = int(w.event_start[end_ev]) + int(np.float32(w.event_length[end_ev]))
        query_size = end_ev - start_ev

        if opt.sam:
            w.out = sam_line(
                w.rec.read_id,
                strand,
                core.ref.ref_names[rid],
                pos_st,
                pos_end,
                mapq,
                query_size,
                start_raw,
                end_raw,
                w.qstart,
                r2q,
                w.event_start,
                w.event_length,
                opt.rna,
            )
        else:
            w.out = paf_line(
                w.rec.read_id,
                w.rec.len_raw_signal,
                start_raw,
                end_raw,
                strand,
                core.ref.ref_names[rid],
                core.ref.ref_seq_lengths[rid],
                pos_st,
                pos_end,
                d1,
                d2,
                mapq,
                query_size,
            )

    if opt.profile:
        core.dtw_time += _time.time() - pending.dtw_t0
    return [w.out for w in works], stats


def _handle_clipped_done(handle) -> bool:
    """True when the engine already produced exact top-5 for clipped
    (qlen != W) reads, so finish_batch can skip the host recompute."""
    if "parts" in handle:
        return all(_handle_clipped_done(h) for h in handle["parts"])
    return bool(handle.get("clipped_done"))


def process_batch(core: Core, blobs: list[bytes]) -> tuple[list[str | None], BatchStats]:
    """Map one batch of raw records; returns per-read output lines."""
    return finish_batch(core, submit_batch(core, blobs))


def run_dtw(core: Core, out_fp) -> None:
    """The batch loop, double-buffered: batch N+1's host stages (decode,
    eventization, normalisation) run while batch N's sDTW executes on the
    device -- JAX dispatch is asynchronous, so submit_batch returns before
    the device finishes and finish_batch is the sync point. Batch N's
    drain (the device->host candidate fetch + backtrack + output) runs on
    a single ordered worker thread, started BEFORE batch N+1's host
    stages: the fetch is link-latency IO (~0.17 s/batch measured over the
    remote-device transport) that releases the GIL, so it overlaps the
    next batch's CPU work even on a 1-core host. --profile-cpu drains
    each batch before submitting the next so the per-stage timers are
    unoverlapped.

    ref: dtw_main.c:299-326 (sequential load->process->output loop).
    """
    import sys
    import threading
    import time

    import os as _os

    opt = core.opt
    realtime0 = time.time()
    state = {"counter": 0}
    tlock = threading.Lock()

    def progress(n_rec: int, n_bytes: int, verb: str) -> None:
        # reference-format stderr line: [dtw_main::REALTIME*CPULOAD]
        rt = time.time() - realtime0
        cpu = sum(_os.times()[:2]) / rt if rt > 0 else 0.0
        sys.stderr.write(
            f"[dtw_main::{rt:.3f}*{cpu:.2f}] {n_rec} Entries "
            f"({n_bytes/1e6:.1f}M bytes) {verb}\n"
        )

    def drain(pending: PendingBatch) -> None:
        t0 = time.time()
        lines, stats = finish_batch(core, pending)
        with tlock:  # submit_batch on the main thread also accumulates
            core.process_db_time += time.time() - t0
        progress(stats.n_rec, stats.sum_bytes, "processed")
        t0 = time.time()
        for line in lines:
            if line is not None:
                out_fp.write(line)
        out_fp.flush()
        core.output_time += time.time() - t0
        core.total_reads += stats.n_rec
        core.sum_bytes += stats.sum_bytes
        core.prefix_fail += stats.prefix_fail
        core.ignored += stats.ignored
        core.too_short += stats.too_short
        state["counter"] += 1
        # fault-injection hook (tests only): simulate a host crashing
        # mid-run after N drained batches -- the distributed peers must
        # fail fast with a named diagnosis, never hang
        # (tests/test_distributed.py::test_mid_run_peer_death)
        die_after = _os.environ.get("SIGFISH_TPU_DIE_AFTER_BATCH")
        if die_after is not None and state["counter"] >= int(die_after):
            _os._exit(9)

    import concurrent.futures as _fut2

    drainer = _fut2.ThreadPoolExecutor(max_workers=1)  # ordered drains
    drain_fut: _fut2.Future | None = None
    pending: PendingBatch | None = None
    done = False
    consumed = 0
    while not done:
        if pending is not None and not opt.profile:
            # start batch N's drain BEFORE batch N+1's load AND host
            # stages: the device fetch is GIL-releasing link IO
            # (~0.17 s/batch) that overlaps both the file read and the
            # prepare CPU even on a 1-core host
            drain_fut = drainer.submit(drain, pending)
            pending = None
        t0 = time.time()
        max_recs = opt.batch_size
        if opt.rec_limit is not None:
            max_recs = min(max_recs, opt.rec_limit - consumed)
        blobs = (
            core.sf.read_batch(
                max_recs, opt.batch_size_bytes,
                shard_id=opt.shard_id, n_shards=opt.n_shards,
            )
            if max_recs > 0
            else []
        )
        consumed += len(blobs)
        core.load_db_time += time.time() - t0
        new_pending = None
        if blobs:
            progress(len(blobs), sum(len(b) for b in blobs), "loaded")
            if opt.profile and pending is not None:
                drain(pending)  # unoverlapped per-stage timers
                pending = None
            t0 = time.time()
            new_pending = submit_batch(core, blobs)
            with tlock:
                core.process_db_time += time.time() - t0
            if (
                len(blobs) < opt.batch_size
                and new_pending.stats.sum_bytes < opt.batch_size_bytes
            ):
                done = True
        else:
            done = True

        if drain_fut is not None:
            drain_fut.result()
            drain_fut = None
        elif pending is not None:
            drain(pending)
        pending = new_pending
        if (
            pending is not None
            and opt.debug_break >= 0
            and state["counter"] > opt.debug_break
        ):
            pending = None
            done = True

    if pending is not None:
        if opt.debug_break < 0 or state["counter"] <= opt.debug_break:
            drain(pending)
    drainer.shutdown(wait=True)
