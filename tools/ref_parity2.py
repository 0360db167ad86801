"""Engine-2 parity: run the reference ctg_cns (nextpolish2.so) on OUR
long-read BAM and compare with our consensus engine on the same input.

Usage: python tools/ref_parity2.py <genome.fa> <batch.pkl> [read_type]
"""
from __future__ import annotations

import ctypes
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish_tpu.io.fasta import FastaIndex
from ref_parity import batch_to_bam  # noqa: E402

READS_TYPE = {"ont": 1, "clr": 2, "hifi": 3, "rs": 4}


class RefQv(ctypes.Structure):
    _fields_ = [("bits", ctypes.c_uint32), ("p", ctypes.c_uint32)]


class Ref(ctypes.Structure):
    _fields_ = [("n", ctypes.c_char_p), ("s", ctypes.POINTER(ctypes.c_uint32)),
                ("qv", ctypes.c_void_p), ("qv_l", ctypes.c_uint32),
                ("length", ctypes.c_uint32)]


class Refs(ctypes.Structure):
    _fields_ = [("ref", ctypes.POINTER(Ref)), ("i", ctypes.c_uint32),
                ("i_m", ctypes.c_uint32)]


class ConsensusTrimed(ctypes.Structure):
    _fields_ = [("len", ctypes.c_uint32), ("identity", ctypes.c_float),
                ("seq", ctypes.c_char_p)]


class ConsensusTrimedData(ctypes.Structure):
    _fields_ = [("data", ctypes.POINTER(ConsensusTrimed)),
                ("i_m", ctypes.c_int)]


def load_ref2(path=None):
    path = path or os.environ.get("NPT_REF2_SO",
                                  "/tmp/refbuild/lib/nextpolish2.so")
    lib = ctypes.CDLL(path)
    lib.read_ref.restype = ctypes.POINTER(Refs)
    lib.read_ref.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int]
    lib.ctg_cns_init.restype = ctypes.c_void_p
    lib.ctg_cns_init.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_float, ctypes.c_float,
                                 ctypes.c_float]
    lib.ctg_cns_core.restype = ctypes.POINTER(ConsensusTrimedData)
    lib.ctg_cns_core.argtypes = [ctypes.c_void_p, ctypes.POINTER(Ref),
                                 ctypes.c_char_p]
    return lib


def run_reference_cns(lib, genome_fa: str, bam_path, read_type: str):
    paths = [bam_path] if isinstance(bam_path, str) else list(bam_path)
    bam_list = paths[0] + ".list"
    with open(bam_list, "w") as fh:
        fh.write("\n".join(paths) + "\n")
    refs = lib.read_ref(genome_fa.encode(), None, 0)
    cfg = lib.ctg_cns_init(5_000_000, READS_TYPE[read_type], 0,
                           0.8, 0.8, 0.8)
    out = {}
    for i in range(refs.contents.i):
        ref = refs.contents.ref[i]
        name = ref.n.decode()
        res = lib.ctg_cns_core(cfg, ctypes.byref(refs.contents.ref[i]),
                               bam_list.encode())
        parts = []
        for j in range(res.contents.i_m):
            parts.append(ctypes.string_at(res.contents.data[j].seq))
        out[name] = parts
    return out


def edit_stats(a: bytes, b: bytes):
    """Approximate distance via the long-read mapper CIGAR."""
    from nextpolish_tpu.align.index import GenomeIndex
    from nextpolish_tpu.align.longread import map_long_batch

    idx = GenomeIndex.build([("x", b)], k=15, w=10)
    r = map_long_batch(idx, [a])[0]
    if r["tid"] < 0:
        return None
    cig = r["cigar"]
    ops, lens = cig & 0xF, cig >> 4
    ind = int(lens[(ops == 1) | (ops == 2)].sum())
    bb = np.frombuffer(b.upper(), np.uint8)
    q = np.frombuffer(a.upper(), np.uint8)
    if r["flag"] & 16:
        comp = bytes.maketrans(b"ACGT", b"TGCA")
        q = np.frombuffer(a.upper().translate(comp)[::-1], np.uint8)
    mm = 0
    qi, ti = 0, r["pos"]
    for op, ln in zip(ops, lens):
        ln = int(ln)
        if op == 0:
            mm += int((q[qi:qi + ln] != bb[ti:ti + ln]).sum())
            qi += ln
            ti += ln
        elif op == 1:
            qi += ln
        elif op == 2:
            ti += ln
        elif op == 4:
            qi += ln
    return mm, ind


def main():
    genome_fa = sys.argv[1]
    batch_pkl = sys.argv[2]
    read_type = sys.argv[3] if len(sys.argv) > 3 else "ont"
    with open(batch_pkl, "rb") as f:
        batch = pickle.load(f)
    tag = os.path.splitext(os.path.basename(batch_pkl))[0]
    workdir = f"/tmp/refparity2_{tag}_{read_type}"
    os.makedirs(workdir, exist_ok=True)
    import shutil

    fa_local = os.path.join(workdir, "genome.fa")
    shutil.copy(genome_fa, fa_local)
    bam_path = os.path.join(workdir, "lgs.sort.bam")
    batch_to_bam(batch, bam_path)
    lib = load_ref2()
    ref_out = run_reference_cns(lib, fa_local, bam_path, read_type)
    print("reference cns done", flush=True)

    from nextpolish_tpu.models.ctg_cns import ctg_cns_contig

    fa = FastaIndex(genome_fa)
    for name in fa.names:
        ours = ctg_cns_contig(name, fa.fetch(name).seq, batch, read_type)
        ref_seq = ref_out[name][0]
        st = edit_stats(ours[0][1].upper(), ref_seq.upper())
        print(f"{name}: ref_len={len(ref_seq)} our_len={len(ours[0][1])} "
              f"mm/ind vs ref-engine: {st}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
