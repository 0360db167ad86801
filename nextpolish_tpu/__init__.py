"""nextpolish_tpu — a TPU-native genome-polishing framework.

A from-scratch reimplementation of the capabilities of NextPolish
(Nextomics/NextPolish) designed for TPU hardware:

* the short-read (SGS) polishing engine — score-chain Viterbi + k-mer vote —
  is reformulated as dense tensor programs: pileups become count tensors,
  the score chain becomes a tropical ((max,+)) matrix scan executed with
  ``jax.lax.associative_scan`` so a whole genome window is corrected in
  log-depth on the VPU/MXU instead of a sequential pointer-chasing DP;
* the long-read / HiFi consensus engine (``ctg_cns``) becomes a batched
  (position, delta, base) lattice DP over windows;
* parallelism is expressed with ``jax.sharding`` over device meshes
  (windows are the batch axis; pileup merges are ``psum`` collectives)
  instead of cluster job files.

Layer map (mirrors SURVEY.md §1 of the reference, re-drawn TPU-first):

    pipeline   driver: config -> rounds -> stages          (pipeline.py, cli.py)
    runtime    local scheduler, retries, resume            (runtime/)
    models     polishing engines (tasks 1-6)               (models/)
    ops        Pallas/JAX kernels: pileup, tropical scan,
               consensus DP, POA, banded alignment         (ops/)
    align      minimizer seed-chain-extend aligner          (align/)
    parallel   mesh, shardings, collectives                (parallel/)
    io         FASTA/FASTQ/BAM, 2-bit codec, read split    (io/)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the chain-scan jits are expensive to
# compile (minutes on TPU); cache them across processes.  Harmless on CPU.
import os as _os

if not _os.environ.get("NPT_NO_JIT_CACHE"):
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "nextpolish_tpu_xla"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # jax config may predate these options
        pass
