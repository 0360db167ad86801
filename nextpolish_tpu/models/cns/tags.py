"""Alignment columns ("align tags") for the consensus engine.

Column semantics follow bam2aln + get_align_tags (lib/ctg_cns.c:2403-2456,
:1213-1256): every aligned column of a read is (t_pos, delta, q_base) with
q_base in {A=0, T=1, G=2, C=3, -=4, N=5}; delta counts the read's own
insertion run after t_pos.  Anchor trimming keeps the alignment between its
first/last runs of 8 exact matches (get_align_shift :139-201); window
clipping drops columns outside [s, e) (clip_aln :2809-2826).

All reads are expanded at once into flat column arrays (read_of, t_pos,
delta, q_base) plus per-position coverage / l_ins / l_del / max-delta
tracks.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ...io.bam import (
    CDEL,
    CHARD_CLIP,
    CINS,
    CMATCH,
    CREF_SKIP,
    CSOFT_CLIP,
    AlnBatch,
)

# q_base codes (base_to_int, lib/ctg_cns.c:58-67)
A, T, G, C, GAP, N = 0, 1, 2, 3, 4, 5
NIB_TO_CNS = np.full(16, N, dtype=np.uint8)
NIB_TO_CNS[1] = A  # A
NIB_TO_CNS[8] = T  # T
NIB_TO_CNS[4] = G  # G
NIB_TO_CNS[2] = C  # C
CNS_TO_ASCII = np.frombuffer(b"ATGC-NM", dtype=np.uint8).copy()
ASCII_TO_CNS = np.full(256, N, dtype=np.uint8)
for _i, _c in enumerate(b"ATGC-NM"):
    ASCII_TO_CNS[_c] = _i
    ASCII_TO_CNS[_c + 32] = _i if _i < 6 else N


@dataclass
class TagColumns:
    """Flat per-column arrays for a set of reads in one window."""

    read_of: np.ndarray  # int32 [T] row id
    t_pos: np.ndarray  # int32 [T] window-local position
    delta: np.ndarray  # int16 [T]
    q_base: np.ndarray  # uint8 [T]
    row_off: np.ndarray  # int64 [n_rows+1]
    aln_t_s: np.ndarray  # int32 [n_rows] window-local first position
    aln_t_e: np.ndarray  # int32 [n_rows] last position (inclusive)
    ridx: np.ndarray  # read index into the source batch (-1 = reference row)

    def row(self, r: int):
        lo, hi = self.row_off[r], self.row_off[r + 1]
        return (self.t_pos[lo:hi], self.delta[lo:hi], self.q_base[lo:hi])

    def n_rows(self) -> int:
        return len(self.row_off) - 1


def read_columns(batch: AlnBatch, r: int):
    """One read's raw alignment columns (t_pos in contig coords, q_base),
    before trimming.  Returns (t_pos[int64], qbase[uint8], is_ins[bool])."""
    cig = batch.rec_cigar(r)
    nib = batch.rec_seq_nib(r)
    ops = (cig & 0xF).astype(np.int64)
    lens = (cig >> 4).astype(np.int64)
    # per-op query/ref starts
    qcon = np.where(
        (ops == CMATCH) | (ops == CINS) | (ops == CSOFT_CLIP)
        | (ops == CHARD_CLIP), lens, 0)
    rcon = np.where((ops == CMATCH) | (ops == CDEL) | (ops == CREF_SKIP),
                    lens, 0)
    qs = np.cumsum(qcon) - qcon
    rs = np.cumsum(rcon) - rcon + int(batch.pos[r])
    emit = (ops == CMATCH) | (ops == CINS) | (ops == CDEL)
    eops = ops[emit]
    elens = lens[emit]
    eqs = qs[emit]
    ers = rs[emit]
    tot = int(elens.sum())
    rep = np.repeat(np.arange(len(eops)), elens)
    j = np.arange(tot) - np.repeat(np.cumsum(elens) - elens, elens)
    opr = eops[rep]
    tpos = np.where(opr == CINS, ers[rep] + j, ers[rep] + j)
    # for I columns t_pos stays at the op's ref start - 1?  bam2aln emits
    # '-' in target: the insertion anchors at the PREVIOUS consumed t base,
    # i.e. tags keep t_pos of the last match/del column; handled downstream
    # via delta runs.  Here: t index where the column "lands":
    tpos = np.where(opr == CINS, ers[rep] - 1, ers[rep] + j)
    qidx = np.where(opr == CDEL, -1, eqs[rep] + j)
    qbase = np.where(qidx >= 0, NIB_TO_CNS[nib[np.maximum(qidx, 0)]], GAP
                     ).astype(np.uint8)
    is_ins = opr == CINS
    return tpos, qbase, is_ins, qidx


def _match_run_bounds(is_match: np.ndarray, k: int = 8):
    """(first_end, last_start) of the first/last runs of k consecutive
    matches; returns (-1, -1) when none exists."""
    if is_match.size < k:
        return -1, -1
    m = is_match.astype(np.int32)
    run = np.convolve(m, np.ones(k, dtype=np.int32), mode="valid")
    hits = np.flatnonzero(run == k)
    if not hits.size:
        return -1, -1
    return int(hits[0]), int(hits[-1]) + k - 1


def build_tags(batch: AlnBatch, ridx: np.ndarray, contig_ascii: np.ndarray,
               win_s: int, win_e: int, anchor_k: int = 8,
               min_span: int = 500, gap_min_len: int = 3):
    """Expand + trim + clip the selected reads into TagColumns, and
    accumulate the per-position tracks.

    contig_ascii: uint8 draft sequence (for match testing).
    win_s/win_e: window [s, e) in contig coordinates.
    Returns (TagColumns with window-local t_pos, coverage, l_ins, l_del,
    max_delta, kept_mask over ridx)."""
    L = win_e - win_s
    ref_cns = ASCII_TO_CNS[contig_ascii]
    all_t, all_d, all_q, all_r = [], [], [], []
    aln_s, aln_e, kept = [], [], []
    coverage = np.zeros(L, dtype=np.int32)
    l_ins = np.zeros(L, dtype=np.int32)
    l_del = np.zeros(L, dtype=np.int32)
    max_delta = np.zeros(L, dtype=np.int32)
    # GAP_MIN_LEN: 3 for ONT, 5 otherwise (ctg_cns_core :3436-3442)

    for row, r in enumerate(ridx):
        tpos, qbase, is_ins, _ = read_columns(batch, int(r))
        if not tpos.size:
            kept.append(False)
            continue
        # window clip FIRST (clip_aln :2809 runs before get_align_shift):
        # keep columns at positions [win_s, win_e); a clipped read with
        # <= 501 columns left is dropped (clip_aln's aln_len=10 path)
        clipped = tpos[0] < win_s or tpos[-1] >= win_e
        if clipped:
            inwin = (tpos >= win_s) & (tpos < win_e)
            if not inwin.any():
                kept.append(False)
                continue
            lo = int(np.argmax(inwin))
            hi = len(inwin) - int(np.argmax(inwin[::-1]))
            if hi - lo <= 501:
                kept.append(False)
                continue
            tpos = tpos[lo:hi]
            qbase = qbase[lo:hi]
            is_ins = is_ins[lo:hi]
            # clip_aln skips leading insertions
            while is_ins.size and is_ins[0]:
                tpos, qbase, is_ins = tpos[1:], qbase[1:], is_ins[1:]
        # anchor trim: keep between the first/last runs of 8 exact matches
        tmatch = (~is_ins) & (qbase != GAP) & (
            qbase == ref_cns[np.clip(tpos, 0, len(ref_cns) - 1)]
        ) & (tpos >= 0) & (tpos < len(ref_cns))
        s_i, e_i = _match_run_bounds(tmatch, anchor_k)
        if s_i < 0:
            kept.append(False)
            continue
        tpos = tpos[s_i : e_i + 1]
        qbase = qbase[s_i : e_i + 1]
        is_ins = is_ins[s_i : e_i + 1]
        # span filter (:3542): keep when aln_t_s <= aln_t_e - 500 with the
        # exclusive end, i.e. span count >= 500 positions
        if not tpos.size or tpos[-1] - tpos[0] + 1 < min_span:
            kept.append(False)
            continue
        kept.append(True)
        t_local = (tpos - win_s).astype(np.int32)
        # delta within insertion runs
        delta = np.zeros(len(t_local), dtype=np.int16)
        if is_ins.any():
            ins_i = np.flatnonzero(is_ins)
            # run-relative index: position within consecutive run
            brk = np.flatnonzero(np.diff(ins_i) != 1)
            starts = np.concatenate([[0], brk + 1])
            run_id = np.zeros(len(ins_i), dtype=np.int64)
            run_id[starts[1:]] = 1
            run_id = np.cumsum(run_id)
            run_start = ins_i[starts][run_id]
            delta[ins_i] = (ins_i - run_start + 1).astype(np.int16)
        all_t.append(t_local)
        all_d.append(delta)
        all_q.append(qbase)
        all_r.append(np.full(len(t_local), len(aln_s), dtype=np.int32))
        aln_s.append(int(t_local[0]))
        aln_e.append(int(t_local[-1]))
        # tracks (get_align_tags :1236-1251)
        d0 = delta == 0
        np.add.at(coverage, t_local[d0], 1)
        np.add.at(l_del, t_local[d0 & (qbase == GAP)], 1)
        np.maximum.at(max_delta, t_local, delta.astype(np.int32))
        # l_ins: once per read per position where its run reaches gap_min_len
        big = delta >= gap_min_len
        if big.any():
            first = big & ~np.concatenate([[False], big[:-1]])
            # count once per contiguous big-run (l flag semantics)
            np.add.at(l_ins, t_local[np.flatnonzero(first)], 1)
        del d0

    kept = np.array(kept, dtype=bool)
    if all_t:
        t_pos = np.concatenate(all_t)
        delta = np.concatenate(all_d)
        q_base = np.concatenate(all_q)
        read_of = np.concatenate(all_r)
        lens = np.array([len(x) for x in all_t], dtype=np.int64)
        row_off = np.concatenate([[0], np.cumsum(lens)])
    else:
        t_pos = np.empty(0, np.int32)
        delta = np.empty(0, np.int16)
        q_base = np.empty(0, np.uint8)
        read_of = np.empty(0, np.int32)
        row_off = np.zeros(1, np.int64)
    cols = TagColumns(read_of, t_pos.astype(np.int32), delta, q_base,
                      row_off, np.array(aln_s, dtype=np.int32),
                      np.array(aln_e, dtype=np.int32),
                      ridx[kept] if len(ridx) else ridx)
    return cols, coverage, l_ins, l_del, max_delta, kept


def reference_row(contig_ascii: np.ndarray, win_s: int, win_e: int):
    """The draft itself as row 0 (ctg_cns_core seeds the MSA with the
    window's reference sequence, lib/ctg_cns.c:3457-3468)."""
    L = win_e - win_s
    t = np.arange(L, dtype=np.int32)
    d = np.zeros(L, dtype=np.int16)
    q = ASCII_TO_CNS[contig_ascii[win_s:win_e]]
    return t, d, q
