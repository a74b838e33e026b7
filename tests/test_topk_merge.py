"""Per-shard top-5 + O(B*k) merge: exactness (tie-heavy) and payload.

The round-5 mesh design (parallel/shard.sharded_engine_topk,
ring_topk_wavefront, ring_topk_scan) replaces the O(B*R) all_gather of
last-row score matrices with shard-local candidate reductions merged
through an O(B*k) collective. These tests pin:

  - bit-identical packed candidates vs the single-device extraction,
    on integer-valued references where exact score ties are common
    (the merge must reproduce update_aln insertion order,
    sigfish.c:577-583, and first-min-wins windows, sigfish.c:895);
  - sub-chunked ring segments (chunked-ref composed with --mesh) do
    not change a byte at any n_sub;
  - the compiled HLO's all-gather payload really is O(B*k), never O(R).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sigfish_tpu.ops.candidates_dev import (
    device_topk_candidates,
    device_window_top5,
    build_column_maps,
    select_topk_cands,
)
from sigfish_tpu.ops.sdtw import make_query_batch, pad_tracks, sdtw_scan
from sigfish_tpu.ops.sdtw_pallas import (
    prepare_wavefront_inputs,
    sdtw_wavefront,
)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")

W, Q, TD = 16, 32, 64
LANE = W - 1
N_TP, RS = 4, 256
R_LAYOUT = N_TP * RS
B = 8


def _tie_layout(seed=7):
    """Integer-valued multi-track layout: exact DP score ties abound."""
    rng = np.random.default_rng(seed)
    raw = [
        rng.integers(0, 3, s).astype(np.float32) for s in (270, 80, 500)
    ]
    ref, reset, offs = pad_tracks(raw, ckpt=TD, align=W)
    R0 = ref.shape[0]
    assert R0 + Q <= R_LAYOUT
    ypad = np.full(R_LAYOUT, 1.0e18, np.float32)
    ypad[:R0] = ref
    rsl = np.zeros(R_LAYOUT, bool)
    rsl[:R0] = reset
    rsl[R0] = True
    u, valid = build_column_maps(
        np.concatenate([offs[:-1], [R_LAYOUT]]), R_LAYOUT,
        track_sizes=[t.size for t in raw],
    )
    queries = [rng.integers(0, 3, W).astype(np.float32) for _ in range(B)]
    qb, qlens, onehot = make_query_batch(queries, pad_q=Q)
    return ypad, rsl, u, valid, qb, qlens, onehot


def _single_device_packed(ypad_l, rsl, valid, qb, qlens):
    yp1, rp1, D = prepare_wavefront_inputs(
        np.where(ypad_l >= 1e17, 1.0e18, ypad_l), rsl, Q, td=TD
    )
    ds = sdtw_wavefront(
        jnp.asarray(qb), jnp.asarray(yp1), jnp.asarray(rp1),
        lane=LANE, td=TD, interpret=True,
    )
    return np.asarray(device_window_top5(
        ds, jnp.asarray(qlens.astype(np.int32)), jnp.asarray(valid),
        R_LAYOUT, W=W, k=5, reindex=True, pack=True,
    ))


@needs8
def test_ring_topk_wavefront_ties_and_chunks():
    from sigfish_tpu.parallel.shard import ring_topk_wavefront

    ypad_l, rsl, u, valid, qb, qlens, _ = _tie_layout()
    packed1 = _single_device_packed(ypad_l, rsl, valid, qb, qlens)
    # sanity: the tie-heavy layout actually produced duplicate scores
    assert len(set(packed1[0, :5].tolist())) < 5

    mesh = Mesh(np.asarray(jax.devices()[:N_TP]).reshape(1, N_TP),
                ("dp", "tp"))
    vd = np.zeros(R_LAYOUT, bool)
    vd[LANE:] = valid[: R_LAYOUT - LANE]
    for n_sub in (1, 2, 4):
        packed_r = np.asarray(ring_topk_wavefront(
            jnp.asarray(qb), jnp.zeros((B,), jnp.int32),
            jnp.asarray(ypad_l.reshape(N_TP, RS)),
            jnp.asarray(rsl.astype(np.float32).reshape(N_TP, RS)),
            jnp.asarray(vd.reshape(N_TP, RS)),
            mesh, n_micro=2, lane=LANE, W=W, Rs=RS, n_sub=n_sub,
            td=TD, interpret=True,
        ))
        assert np.array_equal(packed_r, packed1), f"n_sub={n_sub}"


@needs8
def test_ring_topk_scan_ties():
    from sigfish_tpu.parallel.shard import ring_topk_scan

    ypad_l, rsl, u, valid, qb, qlens, onehot = _tie_layout(seed=9)
    lr = sdtw_scan(
        jnp.asarray(qb), jnp.asarray(onehot), jnp.asarray(ypad_l),
        jnp.asarray(rsl), ckpt=TD,
    )
    packed1 = np.asarray(device_window_top5(
        lr, jnp.asarray(qlens.astype(np.int32)), jnp.asarray(valid),
        R_LAYOUT, W=W, k=5, reindex=False, pack=True,
    ))
    mesh = Mesh(np.asarray(jax.devices()[:N_TP]).reshape(1, N_TP),
                ("dp", "tp"))
    packed_r = np.asarray(ring_topk_scan(
        jnp.asarray(qb), jnp.asarray(onehot),
        jnp.asarray(ypad_l.reshape(N_TP, RS)),
        jnp.asarray(rsl.reshape(N_TP, RS)),
        jnp.asarray(valid.reshape(N_TP, RS)),
        mesh, n_micro=2, W=W, Rs=RS, ckpt=TD,
    ))
    assert np.array_equal(packed_r, packed1)


def test_select_topk_cands_vs_reference_order():
    """The explicit-list selection == a scalar model of update_aln:
    min score, ties to the larger position, k rounds."""
    rng = np.random.default_rng(3)
    sc = rng.integers(0, 4, (6, 12)).astype(np.float32)
    pos = rng.permutation(12 * 6).reshape(6, 12).astype(np.int32)
    ts, tp = select_topk_cands(jnp.asarray(sc), jnp.asarray(pos), k=5)
    ts, tp = np.asarray(ts), np.asarray(tp)
    for b in range(6):
        cands = sorted(
            zip(sc[b].tolist(), pos[b].tolist()),
            key=lambda t: (t[0], -t[1]),
        )
        for j in range(5):
            assert ts[b, j] == cands[j][0]
            assert tp[b, j] == cands[j][1]


@needs8
def test_bigref_ring_chunked_matches_single_device(tmp_path):
    """A synthetic contig large enough to force multi-window ring shards
    maps byte-identically on the 8-device ring with forced sub-chunking
    (chunked-ref composed with --mesh) vs the single-device chunked and
    one-shot paths -- planted reads, clipped reads included."""
    import io

    from sigfish_tpu.io.blow5 import Slow5Record, Slow5Writer
    from sigfish_tpu.models.genref import _seq_bytes, kmer_ranks
    from sigfish_tpu.models.pore_model import (
        MODEL_ID_DNA_R9,
        load_builtin_model,
    )
    from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

    rng = np.random.default_rng(21)
    model = load_builtin_model(MODEL_ID_DNA_R9)
    k = model.kmer_size
    n_bases = 30_000  # ~60k concat columns over both strands
    seq = "".join("ACGT"[b] for b in rng.integers(0, 4, n_bases))
    fa = tmp_path / "big.fa"
    fa.write_text(f">bigsynth\n{seq}\n")

    def signal_from(start, n_ev):
        sub = seq[start : start + n_ev + k - 1]
        levels = model.level_mean[
            kmer_ranks(_seq_bytes(sub), k, warn_non_acgt=False)
        ]
        pa = np.repeat(levels, rng.integers(9, 15, levels.size))
        pa = pa + rng.normal(0.0, 1.2, pa.size)
        raw = np.rint(pa * 8192.0 / 1400.0 - 10.0)
        return np.clip(raw, -32000, 32000).astype(np.int16)

    bl = tmp_path / "big.blow5"
    with Slow5Writer(str(bl), header_data=None) as w:
        for i in range(8):
            start = int(rng.integers(0, n_bases - 800))
            # every 4th read TRULY clipped at q=64 (qlen < W needs
            # events < prefix+query = 114): exercises the ring clip
            # sub-batch -> single-device chunked -> one-shot chain
            # (the recursion fuzz seed 52007 found lived there)
            n_ev = 90 if i % 4 == 3 else 450
            w.write_record(Slow5Record(
                read_id=f"r{i}", read_group=0, digitisation=8192.0,
                offset=10.0, range=1400.0, sampling_rate=4000.0,
                raw_signal=signal_from(start, n_ev),
            ))

    def run(**kw):
        core = Core(str(fa), str(bl), Options(
            engine="pallas", num_thread=2, query_size=64, **kw
        ))
        if kw.get("mesh"):
            assert core.mesh_mode == "ring"
            if kw.get("ref_chunk", 0) > 0:
                assert core.ring_n_sub > 1, "sub-chunking did not engage"
        out = io.StringIO()
        run_dtw(core, out)
        core.close()
        return out.getvalue()

    oneshot = run()
    assert len(oneshot.splitlines()) == 8
    assert run(ref_chunk=4096) == oneshot
    assert run(mesh="1x8", ref_chunk=4096) == oneshot


@needs8
def test_mesh_collective_payload_is_topk_sized():
    """Compiled HLO: every all-gather payload is O(B*k) -- the O(B*R)
    row gather of the round-4 design must be gone from both mesh modes."""
    from sigfish_tpu.parallel.shard import (
        ring_topk_wavefront,
        sharded_engine_topk,
    )

    mesh_r = Mesh(np.asarray(jax.devices()[:N_TP]).reshape(1, N_TP),
                  ("dp", "tp"))
    qb = jnp.zeros((B, Q), jnp.float32)
    texts = {}
    texts["ring"] = ring_topk_wavefront.lower(
        qb, jnp.zeros((B,), jnp.int32),
        jnp.zeros((N_TP, RS), jnp.float32),
        jnp.zeros((N_TP, RS), jnp.float32),
        jnp.zeros((N_TP, RS), bool),
        mesh_r, n_micro=2, lane=LANE, W=W, Rs=RS, n_sub=2, td=TD,
        interpret=True,
    ).compile().as_text()

    mesh_t = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                  ("dp", "tp"))
    D = ((RS + Q + TD - 1) // TD) * TD
    texts["tracks"] = sharded_engine_topk.lower(
        qb, jnp.zeros((B, Q), jnp.float32), jnp.zeros((B,), jnp.int32),
        jnp.zeros((2, RS), jnp.float32), jnp.zeros((2, RS), bool),
        jnp.zeros((2, D), jnp.float32), jnp.zeros((2, D), jnp.float32),
        jnp.zeros((2, RS), jnp.int32), jnp.zeros((2, RS), bool),
        mesh_t, Rs=RS, lane=LANE, ckpt=TD, td=TD, use_pallas=True,
        clip_shift=True, interpret=True,
    ).compile().as_text()

    shape_re = re.compile(r"all-gather\(")
    ty_re = re.compile(r"= \w+\[([\d,]*)\]")
    for name, txt in texts.items():
        gathers = [
            ln for ln in txt.splitlines() if shape_re.search(ln)
        ]
        assert gathers, f"{name}: no all-gather found"
        for ln in gathers:
            m = ty_re.search(ln)
            assert m, ln
            dims = [int(d) for d in m.group(1).split(",") if d]
            n_elems = int(np.prod(dims)) if dims else 1
            # O(B*k*n_tp): 8 reads x 4 shards x (2k+4) = 448 elements
            # at most; the old row gather was B*n_tp*Rs = 8192+
            assert n_elems <= B * 8 * 24, f"{name}: O(R) gather: {ln}"
