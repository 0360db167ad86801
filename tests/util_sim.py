"""Synthetic polishing test cases with alignments known by construction.

A `true` genome is generated; a `draft` is derived by injecting edits
(sub / draft-insertion / draft-deletion); reads are sampled from `true` and
their CIGAR against `draft` is derived from the edit alignment — no aligner
required, so engine tests are decoupled from the mapper.
"""
from __future__ import annotations

import numpy as np

from nextpolish_tpu.io import bam as bamio

BASES = b"ACGT"


def rand_seq(rng, n: int) -> bytes:
    return rng.choice(np.frombuffer(BASES, dtype=np.uint8), n).tobytes()


def make_draft(rng, true: bytes, n_edits: int, margin: int = 25):
    """Inject edits; returns (draft, global alignment draft<-true as
    [(op, len)] with op in 'MID': M match/sub, I true-only, D draft-only)."""
    L = len(true)
    sites = []
    taken = set()
    while len(sites) < n_edits:
        p = int(rng.integers(margin, L - margin))
        if all(abs(p - q) > 8 for q in taken):
            taken.add(p)
            sites.append(p)
    sites.sort()
    draft = bytearray()
    ops = []
    prev = 0

    def add_op(op, ln):
        if ln <= 0:
            return
        if ops and ops[-1][0] == op:
            ops[-1][1] += ln
        else:
            ops.append([op, ln])

    for p in sites:
        add_op("M", p - prev)
        draft += true[prev:p]
        kind = rng.integers(0, 3)
        if kind == 0:  # substitution
            wrong = BASES[(BASES.index(true[p]) + 1 + int(rng.integers(0, 3))) % 4]
            draft.append(wrong)
            add_op("M", 1)
            prev = p + 1
        elif kind == 1:  # draft has an extra base (read sees D)
            ln = int(rng.integers(1, 3))
            draft += true[p : p + 1]
            add_op("M", 1)
            draft += rand_seq(rng, ln)
            add_op("D", ln)
            prev = p + 1
        else:  # draft is missing bases (read sees I)
            ln = int(rng.integers(1, 3))
            draft += true[p : p + 1]
            add_op("M", 1)
            add_op("I", ln)
            prev = p + 1 + ln
    add_op("M", L - prev)
    draft += true[prev:]
    return bytes(draft), [(o, l) for o, l in ops]


def clip_alignment(ops, a: int, b: int):
    """Clip the global draft<-true alignment to true-range [a, b).
    Returns (draft_start, cigar_ops [(op_char, len)])."""
    t = d = 0
    out = []
    dstart = None
    for op, ln in ops:
        if op == "M":
            t2, d2 = t + ln, d + ln
            lo, hi = max(t, a), min(t2, b)
            if lo < hi:
                if dstart is None:
                    dstart = d + (lo - t)
                out.append(("M", hi - lo))
        elif op == "I":
            t2, d2 = t + ln, d
            lo, hi = max(t, a), min(t2, b)
            if lo < hi:
                if dstart is None:
                    # read starts inside a true-insertion; anchor at next
                    # draft position, bases become leading I
                    dstart = d
                out.append(("I", hi - lo))
        else:  # D — draft-only bases: part of the read path once it started
            t2, d2 = t, d + ln
            if dstart is not None and t < b:
                out.append(("D", ln))
        if op == "M":
            t, d = t2, d2
        elif op == "I":
            t = t2
        else:
            d = d2
        if t >= b:
            break
    # trim leading/trailing D
    while out and out[0][0] == "D":
        out.pop(0)
    while out and out[-1][0] == "D":
        out.pop()
    # merge adjacent
    merged = []
    for op, ln in out:
        if merged and merged[-1][0] == op:
            merged[-1] = (op, merged[-1][1] + ln)
        else:
            merged.append((op, ln))
    return dstart, merged


def simulate_reads(rng, true: bytes, ops, read_len: int = 100,
                   step: int = 3, tlen: int = 300, mapq: int = 60,
                   err_rate: float = 0.0):
    """Tile reads over `true`; returns BAM-style record dicts vs the draft."""
    recs = []
    L = len(true)
    i = 0
    for start in range(0, L - read_len + 1, step):
        seq = bytearray(true[start : start + read_len])
        if err_rate > 0:
            for j in range(len(seq)):
                if rng.random() < err_rate:
                    seq[j] = BASES[int(rng.integers(0, 4))]
        dstart, cig = clip_alignment(ops, start, start + read_len)
        if dstart is None or not cig:
            continue
        qlen = sum(l for o, l in cig if o in "MI")
        if qlen != read_len:  # boundary clip mismatch; pad as soft clip
            if qlen < read_len:
                cig = cig + [("S", read_len - qlen)]
            else:
                continue
        cigar = np.array(
            [(ln << 4) | "MIDNSHP=X".index(op) for op, ln in cig],
            dtype=np.uint32,
        )
        recs.append(
            dict(
                name=f"r{i}",
                flag=0 if i % 2 == 0 else 16,
                tid=0,
                pos=dstart,
                mapq=mapq,
                cigar=cigar,
                seq_nib=bamio.seq_to_nib(bytes(seq)),
                qual=np.full(read_len, 35, np.uint8),
                mtid=0,
                mpos=0,
                tlen=tlen if i % 2 == 0 else -tlen,
            )
        )
        i += 1
    return recs


def records_to_batch(recs, draft_len: int, name: str = "ctg1",
                     tmp_path=None) -> bamio.AlnBatch:
    import io as _io

    from nextpolish_tpu.io.bgzf import BgzfWriter

    buf = _io.BytesIO()
    hdr = bamio.BamHeader("@HD\tVN:1.6\n", [name], [draft_len])
    import struct

    with BgzfWriter(buf) as out:
        text = hdr.text.encode()
        b = bytearray()
        b += b"BAM\x01" + struct.pack("<i", len(text)) + text
        b += struct.pack("<i", 1)
        nb = name.encode() + b"\x00"
        b += struct.pack("<i", len(nb)) + nb + struct.pack("<i", draft_len)
        out.write(bytes(b))
        for rec in sorted(recs, key=lambda r: r["pos"]):
            out.write(bamio._encode_record(rec))
    data = buf.getvalue()
    import tempfile, os

    fd, path = tempfile.mkstemp(suffix=".bam")
    with os.fdopen(fd, "wb") as fh:
        fh.write(data)
    batch = bamio.read_bam(path, with_names=True)
    os.unlink(path)
    return batch


def random_messy_records(rng, draft_len: int, n_reads: int = 60):
    """Arbitrary-CIGAR reads for property tests (clips, indels everywhere)."""
    recs = []
    for i in range(n_reads):
        pos = int(rng.integers(0, max(draft_len - 30, 1)))
        ops = []
        if rng.random() < 0.4:
            ops.append(("S", int(rng.integers(1, 8))))
        n_mid = int(rng.integers(1, 6))
        for j in range(n_mid):
            ops.append(("M", int(rng.integers(1, 20))))
            r = rng.random()
            if r < 0.3:
                ops.append(("I", int(rng.integers(1, 5))))
            elif r < 0.6:
                ops.append(("D", int(rng.integers(1, 5))))
        ops.append(("M", int(rng.integers(1, 15))))
        if rng.random() < 0.4:
            ops.append(("S", int(rng.integers(1, 8))))
        # merge adjacent same-type
        merged = []
        for op, ln in ops:
            if merged and merged[-1][0] == op:
                merged[-1] = (op, merged[-1][1] + ln)
            else:
                merged.append((op, ln))
        qlen = sum(l for o, l in merged if o in "MIS")
        seq = rand_seq(rng, qlen)
        cigar = np.array(
            [(ln << 4) | "MIDNSHP=X".index(op) for op, ln in merged],
            dtype=np.uint32,
        )
        recs.append(
            dict(
                name=f"m{i}",
                flag=0,
                tid=0,
                pos=pos,
                mapq=int(rng.integers(0, 61)),
                cigar=cigar,
                seq_nib=bamio.seq_to_nib(seq),
                qual=np.full(qlen, 30, np.uint8),
                mtid=0,
                mpos=0,
                tlen=int(rng.integers(-500, 500)),
            )
        )
    return recs
