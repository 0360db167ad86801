"""SAM -> AlnBatch pickle (aligner parity mode).

Converts an external aligner's SAM (e.g. a minimap2 oracle built from the
reference tree) into our AlnBatch, applying the driver's `samtools view
-F 0x4 | sort` discipline so the polishing engines see exactly what the
reference pipeline would feed them (source/nextPolish:199-226).

Usage: python tools/sam_to_batch.py in.sam out.pkl
"""
from __future__ import annotations

import os
import pickle
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish_tpu.io import bam as bamio

_CIG = re.compile(r"(\d+)([MIDNSHP=X])")
_OPS = "MIDNSHP=X"


def sam_records(path):
    names = []
    lens = []
    recs = []
    for line in open(path):
        if line.startswith("@"):
            if line.startswith("@SQ"):
                f = dict(t.split(":", 1) for t in line.rstrip("\n").split("\t")[1:])
                names.append(f["SN"])
                lens.append(int(f["LN"]))
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        if flag & 0x4:
            continue
        tid = names.index(f[2])
        cigar = np.array(
            [(int(ln) << 4) | _OPS.index(op)
             for ln, op in _CIG.findall(f[5])], dtype=np.uint32)
        seq = f[9].upper().encode() if f[9] != "*" else b""
        qual = (np.frombuffer(f[10].encode(), np.uint8) - 33
                if f[10] != "*" else np.full(len(seq), 255, np.uint8))
        if f[10] == "*" and seq:
            qual = np.full(len(seq), 255, np.uint8)
        tags = b""
        for t in f[11:]:
            k, typ, v = t.split(":", 2)
            if typ == "Z":
                tags += k.encode() + b"Z" + v.encode() + b"\x00"
            elif typ == "i":
                tags += k.encode() + b"i" + int(v).to_bytes(4, "little",
                                                            signed=True)
            elif typ == "A":
                tags += k.encode() + b"A" + v.encode()[:1]
            elif typ == "f":
                import struct

                tags += k.encode() + b"f" + struct.pack("<f", float(v))
        recs.append(dict(
            name=f[0], flag=flag, tid=tid, pos=int(f[3]) - 1,
            mapq=int(f[4]), cigar=cigar, seq_nib=bamio.seq_to_nib(seq),
            qual=qual, mtid=-1, mpos=max(int(f[7]) - 1, -1),
            tlen=int(f[8]), tags=tags,
        ))
    recs.sort(key=lambda r: (r["tid"], r["pos"]))
    return names, lens, recs


def main():
    sam, out = sys.argv[1], sys.argv[2]
    names, lens, recs = sam_records(sam)
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix=".bam")
    os.close(fd)
    bamio.write_bam(tmp, bamio.BamHeader("@HD\tVN:1.6\n", names, lens),
                    recs, index=True)
    batch = bamio.read_bam(tmp, with_names=True)
    os.unlink(tmp)
    with open(out, "wb") as fh:
        pickle.dump(batch, fh)
    print(f"{out}: {len(batch)} records")


if __name__ == "__main__":
    main()
