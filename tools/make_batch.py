"""Generate an alignment-batch pickle for the parity harnesses.

Maps reads (fastx / fofn) to a genome with OUR built-in mapper and pickles
the resulting AlnBatch, so tools/ref_parity{,2}.py can feed identical
alignments to both engines.

Usage:
    python tools/make_batch.py <genome.fa> <reads.fastx|fofn> <out.pkl> \
        [--kind sgs|lgs] [--min-len N]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish_tpu.align.index import GenomeIndex
from nextpolish_tpu.io.fasta import FastaIndex, read_fastx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("genome")
    ap.add_argument("reads")
    ap.add_argument("out")
    ap.add_argument("--kind", default="lgs", choices=["sgs", "lgs"])
    ap.add_argument("--min-len", type=int, default=1000)
    args = ap.parse_args()

    files = [args.reads]
    if args.reads.endswith(".fofn"):
        base = os.path.dirname(args.reads)
        files = [l.strip() if l.strip().startswith("/")
                 else os.path.join(base, l.strip())
                 for l in open(args.reads) if l.strip()]

    genome = FastaIndex(args.genome)
    seqs, quals, names = [], [], []
    for f in files:
        for r in read_fastx(f):
            if args.kind == "lgs" and len(r.seq) < args.min_len:
                continue
            seqs.append(r.seq)
            quals.append(r.qual)
            names.append(r.name)
    print(f"{len(seqs)} reads", flush=True)

    from nextpolish_tpu.align.mapper import records_to_batch

    if args.kind == "lgs":
        from nextpolish_tpu.align.longread import map_long_batch

        idx = GenomeIndex.build(
            [(n, genome.fetch(n).seq) for n in genome.names], k=15, w=10)
        recs = map_long_batch(idx, seqs, names)
    else:
        from nextpolish_tpu.align.mapper import map_short_batch

        idx = GenomeIndex.build(
            [(n, genome.fetch(n).seq) for n in genome.names], k=17, w=7)
        recs = map_short_batch(idx, seqs, names,
                               quals if any(q is not None for q in quals)
                               else None)
    batch = records_to_batch(recs, idx)
    with open(args.out, "wb") as fh:
        pickle.dump(batch, fh)
    print(f"wrote {args.out}: {len(batch)} alignments")


if __name__ == "__main__":
    main()
