"""sigfish-tpu: a TPU-native raw nanopore signal mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of sigfish
(https://github.com/hasindu2008/sigfish): direct mapping of raw nanopore
current signals (S/BLOW5) to a reference FASTA without basecalling, using
subsequence DTW in event space.

Architecture (TPU-first):
  - host (numpy / C++): BLOW5 decode, pA conversion, event segmentation,
    adaptor/polyA detection, output formatting
  - device (JAX / Pallas): batched subsequence-DTW over the synthesized
    reference event track -- the O(query x reference) hot loop
  - scale-out: ``jax.sharding`` read-data-parallelism over a device Mesh

Reference parity is documented per module via `ref:` citations of the
sigfish C sources (file:line).
"""

__version__ = "0.2.0"  # capability parity with sigfish 0.2.0 (SAM @PG VN)

SIGFISH_TPU_VERSION = __version__
