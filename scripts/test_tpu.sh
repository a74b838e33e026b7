#!/usr/bin/env bash
# On-hardware checks that the CPU-pinned pytest suite cannot run: the
# TPU e2e accuracy gates + TPU-vs-CPU byte identity first (the headline
# result), then the Pallas kernel micro-legs (wavefront vs scan + exact
# scalar oracle, clip shift, carry chaining). Stages accumulate into
# FAIL instead of aborting, so one broken leg cannot eat the rest of an
# unattended hardware-recovery session.
set -u
FAIL=0
# later legs compare against PAFs produced by earlier legs -- stale
# files from a previous run must never masquerade as this build's
rm -f /tmp/tpu_dna.paf /tmp/tpu_rna.paf /tmp/cpu_dna.paf /tmp/cpu_rna.paf \
      /tmp/tpu_dna_dev.paf /tmp/tpu_rna_dev.paf /tmp/tpu_dna_chunked.paf \
      /tmp/or.out /tmp/tpu_or.out
leg() {  # leg NAME CMD...
  local name="$1"; shift
  if "$@"; then echo "PASS leg: $name"; else echo "FAIL leg: $name"; FAIL=1; fi
}

# ---------------------------------------------- e2e gates, TPU engine
gate() {  # gate NAME TRUTH PAF MIN_CORRECT_PCT
  local c
  c=$(python -m sigfish_tpu.cli eval "$2" "$3" 2>/dev/null \
      | awk -F'[(%]' '/^correct/{print $2}')
  awk -v c="$c" -v m="$4" 'BEGIN{exit !(c>=m)}' \
      || { echo "FAIL $1: correct $c% < $4%"; return 1; }
  echo "PASS $1: correct $c% >= $4%"
}
e2e() {
  python -m sigfish_tpu.cli dtw /root/reference/test/nCoV-2019.reference.fasta \
      /root/reference/test/sp1_dna.blow5 2>/dev/null > /tmp/tpu_dna.paf \
      || return 1
  gate dna /root/reference/test/sp1_dna.minimap2.paf /tmp/tpu_dna.paf 85 \
      || return 1
  python -m sigfish_tpu.cli dtw /root/reference/test/rnasequin_sequences_2.4.fa \
      /root/reference/test/sequin_rna.blow5 --rna -q 500 -p -1 \
      2>/dev/null > /tmp/tpu_rna.paf || return 1
  gate rna /root/reference/test/sequin_rna.minimap2.paf /tmp/tpu_rna.paf 75
}
leg "e2e accuracy gates (TPU engine)" e2e

# the wavefront kernel is bitwise-exact, so the TPU-engine PAF must be
# byte-identical to the CPU/native engine's
byte_identity() {
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      python -m sigfish_tpu.cli dtw /root/reference/test/nCoV-2019.reference.fasta \
      /root/reference/test/sp1_dna.blow5 2>/dev/null > /tmp/cpu_dna.paf \
      || return 1
  cmp /tmp/tpu_dna.paf /tmp/cpu_dna.paf || return 1
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      python -m sigfish_tpu.cli dtw /root/reference/test/rnasequin_sequences_2.4.fa \
      /root/reference/test/sequin_rna.blow5 --rna -q 500 -p -1 \
      2>/dev/null > /tmp/cpu_rna.paf || return 1
  cmp /tmp/tpu_rna.paf /tmp/cpu_rna.paf
}
leg "TPU PAF byte-identical to CPU engine (DNA + RNA)" byte_identity

# --host-stages device on real hardware: TPU f64 is emulated (~1e-15
# relative error, ops/events_device.py:36-44), so byte parity vs the
# host path is NOT expected here. The hardware contract is (a) the same
# accuracy gates as the host path and (b) near-total agreement with the
# host-path output, measured by eval'ing device-path PAF against
# host-path PAF (the correct% there IS the agreement rate).
dev_events() {
  python -m sigfish_tpu.cli dtw /root/reference/test/nCoV-2019.reference.fasta \
      /root/reference/test/sp1_dna.blow5 --host-stages device \
      2>/dev/null > /tmp/tpu_dna_dev.paf || return 1
  gate dna-dev-events /root/reference/test/sp1_dna.minimap2.paf \
      /tmp/tpu_dna_dev.paf 85 || return 1
  python -m sigfish_tpu.cli dtw /root/reference/test/rnasequin_sequences_2.4.fa \
      /root/reference/test/sequin_rna.blow5 --rna -q 500 -p -1 \
      --host-stages device 2>/dev/null > /tmp/tpu_rna_dev.paf || return 1
  gate rna-dev-events /root/reference/test/sequin_rna.minimap2.paf \
      /tmp/tpu_rna_dev.paf 75 || return 1
  # agreement vs the host path (host-path PAF as the truthset)
  gate dna-dev-vs-host /tmp/tpu_dna.paf /tmp/tpu_dna_dev.paf 95 || return 1
  gate rna-dev-vs-host /tmp/tpu_rna.paf /tmp/tpu_rna_dev.paf 95
}
leg "--host-stages device on TPU (gates + host-path agreement)" dev_events

# TPU engine vs the C binary DIRECTLY (not just vs the CPU engine), on
# option combos past the defaults -- exercises SAM/ss tags, from-end
# windowing, K/B batch bounds and debug-break through the wavefront
# kernel + device top-5 with the shared trained TSV. Oracle + TSVs
# bootstrap idempotently (same chain parity_oracle.sh uses).
tpu_oracle() {
  bash "$(dirname "$0")/build_oracle.sh" >/dev/null 2>&1 || return 1
  local FA=/root/reference/test/nCoV-2019.reference.fasta
  local BL=/root/reference/test/sp1_dna.blow5
  local TSV=/tmp/sigfish_models/r9.4_dna_6mer.tsv
  local OR=/tmp/refbuild/sigfish
  local flags
  for flags in "--sam" "--from-end" "-K 2 -B 100K" "--debug-break 1"; do
    $OR dtw $FA $BL --kmer-model $TSV $flags -t 1 2>/dev/null \
        > /tmp/or.out || return 1
    python -m sigfish_tpu.cli dtw $FA $BL --kmer-model $TSV $flags \
        2>/dev/null > /tmp/tpu_or.out || return 1
    cmp -s /tmp/or.out /tmp/tpu_or.out \
        || { echo "  diff at: $flags"; return 1; }
    echo "  byte-identical: $flags"
  done
  # RNA through the same direct diff: polyA autodetect + reversal +
  # 3'-truncation coordinates + ss-tag mirroring on the Q=512 kernel
  local RFA=/root/reference/test/rnasequin_sequences_2.4.fa
  local RBL=/root/reference/test/sequin_rna.blow5
  local RTSV=/tmp/sigfish_models/r9.4_rna_5mer.tsv
  for flags in "--sam" "" "--dtw-std"; do
    $OR dtw $RFA $RBL --kmer-model $RTSV --rna -q 500 -p -1 $flags -t 1 \
        2>/dev/null > /tmp/or.out || return 1
    python -m sigfish_tpu.cli dtw $RFA $RBL --kmer-model $RTSV \
        --rna -q 500 -p -1 $flags 2>/dev/null > /tmp/tpu_or.out || return 1
    cmp -s /tmp/or.out /tmp/tpu_or.out \
        || { echo "  diff at: rna $flags"; return 1; }
    echo "  byte-identical: rna ${flags:-default}"
  done
}
leg "TPU engine byte-identical to the C binary (option combos)" tpu_oracle

# chunked reference axis (ops/chunked_ref.py): forced tiny segments on
# the real chip must be byte-identical to the one-shot kernel path
chunked_ref() {
  python -m sigfish_tpu.cli dtw /root/reference/test/nCoV-2019.reference.fasta \
      /root/reference/test/sp1_dna.blow5 --ref-chunk 8000 \
      2>/dev/null > /tmp/tpu_dna_chunked.paf || return 1
  cmp /tmp/tpu_dna.paf /tmp/tpu_dna_chunked.paf
}
leg "chunked-ref PAF byte-identical to one-shot (DNA, forced)" chunked_ref

# multi-megabase contig on one chip (the HBM-cliff case the one-shot
# buffer cannot fit; planted-read recovery >= 90%)
leg "bigref: 5.2M-column contig on one chip" \
    python scripts/test_bigref.py --mbases 2.6 --reads 64

# ------------------------------------------------ kernel micro-legs
leg "wavefront vs scan + exact scalar oracle" python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", "needs a TPU"
from sigfish_tpu.ops.sdtw import make_query_batch, pad_tracks, sdtw_scan
from sigfish_tpu.ops.sdtw_pallas import sdtw_wavefront, prepare_wavefront_inputs
from sigfish_tpu.ops.sdtw_ref import subsequence_cost

rng = np.random.default_rng(0)
tracks = [rng.standard_normal(s).astype(np.float32) for s in (3000, 1733, 510)]
ref, reset, offs = pad_tracks(tracks, ckpt=512, align=250)
R = ref.shape[0]
queries = [rng.standard_normal(250).astype(np.float32) for _ in range(64)]
qb, qlens, onehot = make_query_batch(queries, pad_q=256)

ypad, rspad, D = prepare_wavefront_inputs(ref, reset, 256, td=128)
ds = np.asarray(sdtw_wavefront(jnp.asarray(qb),
                               jnp.asarray(ypad), jnp.asarray(rspad),
                               lane=249, td=128))
lr_wf = np.stack([ds[b, 249:249+R] for b in range(64)])
lr_scan = np.asarray(sdtw_scan(jnp.asarray(qb), jnp.asarray(onehot),
                               jnp.asarray(ref), jnp.asarray(reset), ckpt=512))
sel = np.abs(lr_scan) < 1e17
err = np.abs(lr_wf - lr_scan)[sel].max()
assert err < 1e-3, f"wavefront vs scan err {err}"
print(f"pallas-vs-scan max err: {err:.2e}  OK")

# exact scalar spot-check on one track: the wavefront kernel's per-cell
# op order is the scalar order, so it must be BITWISE identical
# (measured 0.0 on v5e; the scan engine is the ulp-drifting one)
ex = np.asarray(subsequence_cost(queries[0], tracks[0]))[-1]
lo = int(offs[0])
assert np.array_equal(lr_wf[0, lo:lo+3000], ex), \
    f"wavefront != exact scalar, max err {np.abs(lr_wf[0, lo:lo+3000] - ex).max():.2e}"
print("pallas-vs-exact: bitwise identical  OK")
EOF

# clipped reads via shift_queries_for_clip: every qlen must be BITWISE
# identical to the scalar oracle on hardware (the clip device pass)
leg "clip-shift device pass bit-exact" python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from sigfish_tpu.ops.sdtw import make_query_batch, pad_tracks
from sigfish_tpu.ops.sdtw_pallas import (
    prepare_wavefront_inputs, sdtw_wavefront, shift_queries_for_clip)
from sigfish_tpu.ops.sdtw_ref import subsequence_cost

rng = np.random.default_rng(2)
W, Q, td, lane = 250, 256, 128, 249
tracks = [rng.standard_normal(s).astype(np.float32) for s in (900, 400)]
ref, reset, offs = pad_tracks(tracks, ckpt=128, align=W)
R = ref.shape[0]
qlist = [rng.standard_normal(n).astype(np.float32)
         for n in (W, 1, 25, 107, W - 1)]
qb, qlens, _ = make_query_batch(qlist, pad_q=Q)
qb_k, fs = shift_queries_for_clip(qb, qlens, lane)
ds = np.asarray(sdtw_wavefront(
    jnp.asarray(qb_k), *map(jnp.asarray, prepare_wavefront_inputs(
        ref, reset, Q, td=td)[:2]), lane=lane, td=td,
    start_lanes=jnp.asarray(fs)))
lr = ds[:, lane:lane + R]
for b, q in enumerate(qlist):
    for t, tr in enumerate(tracks):
        lo = int(offs[t])
        ex = subsequence_cost(q, tr)[-1]
        assert np.array_equal(lr[b, lo:lo + tr.size], ex), \
            f"clip qlen={q.size} track {t} not bit-exact"
print("clip-shift pass: bitwise identical at every qlen  OK")
EOF

# carry-kernel variant (ring-mode building block): chained segments must
# be bit-identical to one pass (Mosaic compile + exactness on hardware),
# including clipped reads through the per-read free-start mask
leg "carry kernel chained == one pass (incl. clip mask)" python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from sigfish_tpu.ops.sdtw import make_query_batch
from sigfish_tpu.ops.sdtw_pallas import (
    BIG, PAD, prepare_wavefront_inputs, sdtw_wavefront,
    sdtw_wavefront_carry, shift_queries_for_clip)
from sigfish_tpu.ops.sdtw_ref import subsequence_cost
rng = np.random.default_rng(1)
B, Q, td, lane = 64, 256, 128, 249
W = lane + 1
ref = rng.standard_normal(4000).astype(np.float32)
reset = np.zeros(4000, bool); reset[0] = True; reset[2100] = True
ypad, rspad, D = prepare_wavefront_inputs(ref, reset, Q, td=td)
qlist = [rng.standard_normal(W if i % 4 else 57).astype(np.float32)
         for i in range(B)]
qb, qlens, _ = make_query_batch(qlist, pad_q=Q)
q, fs = shift_queries_for_clip(qb, qlens, lane)
q = q.astype(np.float32); sl = jnp.asarray(fs)
full = np.asarray(sdtw_wavefront(q, jnp.asarray(ypad), jnp.asarray(rspad),
                                 lane=lane, td=td, start_lanes=sl))
a1 = jnp.full((B, Q), BIG, jnp.float32); a2 = jnp.full((B, Q), BIG, jnp.float32)
yw = jnp.full((1, Q), PAD, jnp.float32); rw = jnp.zeros((1, Q), jnp.float32)
outs = []
half = (D // td // 2) * td
for a, b in ((0, half), (half, D)):
    o, a1, a2, yw, rw = sdtw_wavefront_carry(
        q, jnp.asarray(ypad[:, a:b]), jnp.asarray(rspad[:, a:b]),
        a1, a2, yw, rw, lane=lane, td=td, start_lanes=sl)
    outs.append(np.asarray(o))
chained = np.concatenate(outs, axis=1)
assert np.array_equal(chained, full)
# clipped read vs scalar oracle on the first track
ex = subsequence_cost(qlist[0], ref[:2100])[-1]
assert np.array_equal(chained[0, lane:lane+2100], ex)
print("carry kernel: chained segments bit-exact incl. clipped reads  OK")
EOF

echo
if [ "$FAIL" = 0 ]; then echo "TPU CHECKS: ALL PASS"; else echo "TPU CHECKS: FAILURES"; fi
exit $FAIL
