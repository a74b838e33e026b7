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


def enable_xla_cache() -> None:
    """Persistent XLA compilation cache: the RNA engine shapes take
    ~2-3 min to compile cold and milliseconds to load back (observed
    145s -> 6.5s end-to-end on the sequin test). Opt out with
    SIGFISH_TPU_NO_XLA_CACHE=1 or point elsewhere with
    SIGFISH_TPU_XLA_CACHE_DIR.

    Called from the CLI entry points (cli.main / bench), NOT at package
    import: a library import must not mutate process-global jax config.
    """
    import os

    if os.environ.get("SIGFISH_TPU_NO_XLA_CACHE"):
        return
    try:
        import jax

        d = os.environ.get(
            "SIGFISH_TPU_XLA_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "sigfish_xla"),
        )
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only home: run without the cache
