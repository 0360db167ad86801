"""Multi-host work partitioning (blc_genome role, source/nextPolish:93-117).

The reference bins contigs into `parallel_jobs` blocks by cumulative length
and submits one shell job per block.  Here the same greedy binning assigns
contig blocks to JAX processes: each host polishes its block and writes its
own part file; the rank-0 host gathers (shared filesystem, like the
reference's `cat`).
"""
from __future__ import annotations


def blc_genome(lengths: dict, n_blocks: int) -> dict:
    """contig name -> block id, greedy by cumulative length
    (source/nextPolish:106-114 semantics)."""
    total = sum(lengths.values())
    blocksize = int(total / float(n_blocks) + 1)
    out = {}
    acc = 0
    block = 0
    for name, ln in lengths.items():
        out[name] = block
        acc += ln
        if acc >= blocksize:
            acc = 0
            block += 1
    return out


def my_contigs(lengths: dict) -> list:
    """Contigs assigned to this process under jax.distributed.

    Single-process runs get everything; multi-host runs split by
    blc_genome over jax.process_count()."""
    import jax

    n = jax.process_count()
    if n <= 1:
        return list(lengths)
    blocks = blc_genome(lengths, n)
    me = jax.process_index()
    return [name for name, b in blocks.items() if b == me]
