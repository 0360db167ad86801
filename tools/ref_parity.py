"""Reference-parity harness: run the reference NextPolish engine (built as
a shared object from a scratch copy of the reference tree) on a BAM that WE
produced, and diff against our engine on the same alignments.

Usage:
    python tools/ref_parity.py <genome.fa> <batch.pkl> [task]

Requires NPT_REF_SO to point at a compiled nextpolish1.so (see the build
recipe in .claude/skills/verify/SKILL.md).  This is a verification tool:
identical inputs isolate engine semantics from aligner differences.
"""
from __future__ import annotations

import ctypes
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish_tpu.io import bam as bamio
from nextpolish_tpu.io.fasta import FastaIndex


class PolishPoint(ctypes.Structure):
    _fields_ = [("pos", ctypes.c_int32), ("index", ctypes.c_int16),
                ("curbase", ctypes.c_char), ("base", ctypes.c_char)]


class PolishResult(ctypes.Structure):
    _fields_ = [("contig", ctypes.c_char_p),
                ("data", ctypes.POINTER(PolishPoint)),
                ("length", ctypes.c_int32), ("datalength", ctypes.c_int32)]


def load_ref_lib(path=None):
    path = path or os.environ.get("NPT_REF_SO",
                                  "/tmp/refbuild/lib/nextpolish1.so")
    lib = ctypes.CDLL(path)
    lib.config_init.restype = ctypes.c_void_p
    lib.config_init.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                ctypes.c_char_p]
    for fn in ("score_chain", "kmer_count", "snp_phase", "snp_valid", "lgspolish"):
        getattr(lib, fn).restype = ctypes.POINTER(PolishResult)
        getattr(lib, fn).argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    return lib


def write_fai(fa_path: str):
    """faidx for single-line FASTA records (our emit format)."""
    lines = []
    with open(fa_path, "rb") as fh:
        off = 0
        name = None
        while True:
            line = fh.readline()
            if not line:
                break
            if line.startswith(b">"):
                name = line.split()[0][1:].decode()
                seq_off = off + len(line)
            else:
                ln = len(line.rstrip(b"\n"))
                lines.append(f"{name}\t{ln}\t{seq_off}\t{ln}\t{ln + 1}")
            off += len(line)
    with open(fa_path + ".fai", "w") as fh:
        fh.write("\n".join(lines) + "\n")


def batch_to_bam(batch: bamio.AlnBatch, path: str):
    recs = []
    for i in range(len(batch)):
        recs.append(dict(
            name=batch.names[i] if batch.names else f"r{i}",
            flag=int(batch.flag[i]), tid=int(batch.tid[i]),
            pos=int(batch.pos[i]), mapq=int(batch.mapq[i]),
            cigar=batch.rec_cigar(i), seq_nib=batch.rec_seq_nib(i),
            qual=batch.rec_qual(i), mtid=int(batch.mtid[i]),
            mpos=int(batch.mpos[i]), tlen=int(batch.tlen[i]),
            tags=batch.rec_tags(i),
        ))
    bamio.write_bam(path, batch.header, recs, index=True)


def run_reference(lib, task: str, fasta: str, bam: str):
    cfg = lib.config_init(fasta.encode(), bam.encode(), b"/nonexistent")
    fa = FastaIndex(fasta)
    out = {}
    fn = getattr(lib, task)
    for name in fa.names:
        res = fn(name.encode(), cfg)
        out[name] = ctypes.string_at(res.contents.contig)
    return out


def main():
    genome_fa = sys.argv[1]
    batch_pkl = sys.argv[2]
    task = sys.argv[3] if len(sys.argv) > 3 else "score_chain"
    with open(batch_pkl, "rb") as f:
        batch = pickle.load(f)
    workdir = "/tmp/refparity"
    os.makedirs(workdir, exist_ok=True)
    import shutil

    fa_local = os.path.join(workdir, "genome.fa")
    shutil.copy(genome_fa, fa_local)
    write_fai(fa_local)
    bam_path = os.path.join(workdir, "reads.sort.bam")
    batch_to_bam(batch, bam_path)
    lib = load_ref_lib()
    ref_out = run_reference(lib, task, fa_local, bam_path)

    from nextpolish_tpu.models.kmer_count import kmer_count_contig
    from nextpolish_tpu.models.score_chain import (
        AlgoConfig,
        estimate_read_tlen,
        score_chain_contig,
    )

    cfg = AlgoConfig()
    cfg.read_tlen = estimate_read_tlen(batch, cfg)
    ours_fn = {"score_chain": score_chain_contig,
               "kmer_count": kmer_count_contig}[task]
    fa = FastaIndex(genome_fa)
    for name in fa.names:
        ours = ours_fn(name, fa.fetch(name).seq, batch, cfg)
        ref = ref_out[name]
        same = ours.upper() == ref.upper()
        same_case = ours == ref
        print(f"{name}: ref_len={len(ref)} our_len={len(ours)} "
              f"seq_match={same} case_match={same_case}")
        if not same:
            a, b = ours.upper(), ref.upper()
            n = min(len(a), len(b))
            aa = np.frombuffer(a[:n], np.uint8)
            bb = np.frombuffer(b[:n], np.uint8)
            d = np.flatnonzero(aa != bb)
            print(f"  first diffs at {d[:10]}")
            if len(d):
                p = int(d[0])
                print("  ref:", ref[max(p-20,0):p+25])
                print("  our:", ours[max(p-20,0):p+25])
    return 0


if __name__ == "__main__":
    sys.exit(main())
