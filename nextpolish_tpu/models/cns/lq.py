"""Low-quality region repair for the consensus engine.

Mirrors the reference's pipeline (lib/ctg_cns.c):
  * region detection from insertion-pressure and deletion-pressure tracks
    (get_lqseqs_from_gap :1630-1725, get_l_del_regions :1562-1628) with
    high-quality flank search;
  * per-region candidate substrings from reads spanning the region
    (generate_lqseqs_from_tags :822-984) with length filtering and 8-mer
    kscore ranking (count_kmers/count_kscore :405-449);
  * seed construction + 2 refinement iterations re-aligning the top
    candidates to the seed and re-running the link DP on the mini-MSA
    (generate_consensus_trimed / iterate_generate_consensus_trimed
    :1287-1473), then splicing seeds back (update_consensus_trimed :1165).

Round-1 deviation (documented): SA-tag gap clusters are not wired in yet
(the reference only engages them for contigs > 100 kb).
"""
from __future__ import annotations

import numpy as np

from ...align.extend import band_align, traceback_batch
from .dp import Consensus, link_dp, traceback
from .msa import build_edges
from .tags import ASCII_TO_CNS, CNS_TO_ASCII, GAP, TagColumns

HQ_MIN_QV = 60
HQSEQ_MIN_LEN = 4
GAP_FLANK_LEN = 10
GAP_BETWEEN_LEN = 30
GAP_MIN_RATIO2 = 0.1
GAP_MIN_RATIO3 = 0.6
DEL_MIN_LEN = 20
DEL_MIN_DEPTH_RATIO = 0.3
LQSEQ_MAX_CAN_COUNT = 60
LQSEQ_MAX_COUNT = 30
KMER_LEN = 8
KMER_RANGE = 40
GAP_MIN_RATIO1 = {"ont": 0.01, "clr": 0.3, "rs": 0.3, "hifi": 0.3}


def _hq_flank(cns: Consensus, l_ins, l_del, i, direction, use_del=False):
    """Scan outward from consensus index i for a run of HQSEQ_MIN_LEN
    high-qv bases ending at a base change with no insertion pressure
    (the flank loops at :1672-1688)."""
    n = len(cns.pos)
    p = 0
    j = i
    while 0 < j < n - 1:
        good = cns.qv[j] >= HQ_MIN_QV
        if use_del:
            good = good and l_del[cns.pos[j]] < DEL_MIN_DEPTH_RATIO * max(
                1, l_del[cns.pos[j]]
            )
        p = p + 1 if good else 0
        nxt = j + direction
        if (p >= HQSEQ_MIN_LEN
                and (cns.base[j] & 0xDF) != (cns.base[nxt] & 0xDF)
                and l_ins[cns.pos[j]] <= 0):
            break
        j += direction
    return j


def find_lq_regions(cns: Consensus, coverage, l_ins, l_del, read_type
                    ) -> list[tuple[int, int]]:
    """Regions [start, end] (window positions) needing repair, ascending."""
    n = len(cns.pos)
    if not n:
        return []
    ratio1 = GAP_MIN_RATIO1[read_type]
    regions = []  # descending like the C walk
    i = n - 1
    covp = coverage[cns.pos]
    li = l_ins[cns.pos]
    while i >= 0:
        if li[i] < covp[i] * ratio1:
            i -= 1
            continue
        if li[i] < covp[i] * GAP_MIN_RATIO2:
            # weak signal: sum insertion pressure over +-GAP_FLANK_LEN
            p0 = cns.pos[i]
            sel = (cns.pos >= p0 - GAP_FLANK_LEN) & (cns.pos <= p0 + GAP_FLANK_LEN)
            upos = np.unique(cns.pos[sel])
            tot = int(l_ins[upos].sum())
            if tot < covp[i] * GAP_MIN_RATIO3:
                i -= 1
                continue
        s_i = _hq_flank(cns, l_ins, l_del, i, -1)
        e_i = _hq_flank(cns, l_ins, l_del, i, +1)
        s = int(cns.pos[s_i]) if s_i > 0 else int(cns.pos[0])
        e = int(cns.pos[e_i]) if e_i < n - 1 else int(cns.pos[-1])
        if regions and e + GAP_BETWEEN_LEN >= regions[-1][0]:
            regions[-1] = (s, regions[-1][1])
        else:
            regions.append((s, e))
        i = s_i - 1

    # deletion-pressure regions (get_l_del_regions)
    dd = l_del[cns.pos] > covp * DEL_MIN_DEPTH_RATIO
    gaps = np.diff(cns.pos.astype(np.int64)) >= DEL_MIN_LEN
    cand = np.flatnonzero(dd[1:] | gaps) + 1
    for i in cand:
        s_i = _hq_flank(cns, l_ins, l_del, int(i), -1)
        e_i = _hq_flank(cns, l_ins, l_del, int(i), +1)
        s, e = int(cns.pos[s_i]), int(cns.pos[e_i])
        if e - s < DEL_MIN_LEN:
            continue
        merged = False
        for k, (rs, re) in enumerate(regions):
            if not (e < rs or s > re):
                regions[k] = (min(rs, s), max(re, e))
                merged = True
                break
        if not merged:
            regions.append((s, e))
    regions.sort()
    out = []
    for s, e in regions:
        if out and s <= out[-1][1] + GAP_BETWEEN_LEN:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def extract_candidates(cols: TagColumns, s: int, e: int,
                       max_count: int = LQSEQ_MAX_CAN_COUNT):
    """Read substrings over [s, e] from rows spanning it (row 0 = ref is
    skipped, matching the C's `for i = 1 ...` loop)."""
    cands = []
    n_empty = 0
    for r in range(1, cols.n_rows()):
        if len(cands) >= max_count:
            break
        if cols.aln_t_s[r] >= s or cols.aln_t_e[r] <= e:
            continue
        t, d, q = cols.row(r)
        sel = (t >= s) & (t <= e) & (q != GAP)
        seq = CNS_TO_ASCII[q[sel]].tobytes()
        if len(seq) > e - s + 1:
            cands.append(seq)
        else:
            n_empty += 1
    return cands, n_empty


def kscore_rank(cands: list[bytes]):
    """8-mer sharing score over the first KMER_RANGE bases
    (count_kmers/count_kscore)."""
    table = {}
    for seq in cands:
        lim = min(len(seq), KMER_RANGE) - KMER_LEN
        for k in range(max(lim, 0)):
            km = seq[k : k + KMER_LEN]
            table[km] = table.get(km, 0) + 1
    scores = []
    for seq in cands:
        lim = min(len(seq), KMER_RANGE) - KMER_LEN
        sc = sum(table.get(seq[k : k + KMER_LEN], 0)
                 for k in range(max(lim, 0)))
        scores.append(sc)
    return np.array(scores, dtype=np.int64)


def _filter_lengths(cands: list[bytes]) -> list[bytes]:
    """Median-based length outlier trimming (:892-910)."""
    if len(cands) <= 4:
        return cands
    cands = sorted(cands, key=len)
    k = len(cands) // 2
    while len(cands) > k and (
        len(cands[-1]) > 2 * len(cands[k])
        or len(cands[-1]) >= 1.4 * len(cands[-2])
    ):
        cands.pop()
    if len(cands) == k:
        return []
    while len(cands) > k and len(cands[0]) < len(cands[k]) // 2:
        cands.pop(0)
    return cands


def _align_to_seed(cands: list[bytes], seed: bytes):
    """Batched global alignment of candidates to the seed; returns per-cand
    [(seed_pos, replacement bytes)] with -1-pos pieces ignored, or None."""
    if not cands:
        return []
    from ...align.minimizer import seq_codes

    R = max(max((len(c) for c in cands), default=1), 1)
    dmax = max(abs(len(c) - len(seed)) for c in cands)
    # fixed bucket sets keep the number of distinct jit shapes tiny
    for B in (64, 256, 512):
        if B // 2 - 4 > dmax:
            break
    else:
        return [None] * len(cands)
    for Rb in (64, 256, 1024, 4096, 16384):
        if Rb >= R:
            break
    else:
        return [None] * len(cands)
    off = B // 2
    Bt = len(cands)
    q = np.full((Bt, Rb), 4, dtype=np.uint8)
    t = np.full((Bt, Rb + B), 4, dtype=np.uint8)
    qlen = np.zeros(Bt, dtype=np.int32)
    tseq = seq_codes(seed)
    for i, csec in enumerate(cands):
        cc = seq_codes(csec)
        q[i, : len(cc)] = cc
        t[i, off : off + len(tseq)] = tseq
        qlen[i] = len(cc)
    tlen = np.full(Bt, len(seed), dtype=np.int32)
    tb, sc, ei, ec = band_align(q, t, qlen, tlen, match=1, mismatch=2,
                                gapo=2, gape=1, mode="global")
    ops, i_lo, j_lo, i_hi, j_hi, lead = traceback_batch(tb, ei, ec, qlen,
                                                        mode="global")
    rows = []
    for i, csec in enumerate(cands):
        if int(i_lo[i]) != 0 or int(i_hi[i]) != qlen[i] - 1:
            rows.append(None)
            continue
        o = ops[i][ops[i] > 0] - 1
        o = o[::-1]
        pieces = []
        qi, ti = 0, -int(lead[i])
        for op in o:
            if op == 0:  # M
                if ti >= 0:
                    pieces.append((ti, csec[qi : qi + 1]))
                qi += 1
                ti += 1
            elif op == 1:  # I: attach to previous seed column
                if pieces and pieces[-1][0] >= 0:
                    pieces[-1] = (pieces[-1][0],
                                  pieces[-1][1] + csec[qi : qi + 1])
                qi += 1
            else:  # D
                if ti >= 0:
                    pieces.append((ti, b""))
                ti += 1
        rows.append(pieces)
    return rows


def build_seed(cands: list[bytes], n_empty: int) -> bytes | None:
    """Seed selection (generate_lqseqs_from_tags :873-963): majority
    short-circuit, length filter, kscore ranking, star seed."""
    if len(cands) <= 4 or len(cands) < n_empty * 0.5:
        return None
    # exact-duplicate majority
    uniq: dict[bytes, int] = {}
    for c in cands:
        uniq[c] = uniq.get(c, 0) + 1
    best_seq, best_n = max(uniq.items(), key=lambda kv: (kv[1], len(kv[0])))
    cands = _filter_lengths(cands)
    if not cands:
        return None
    ks = kscore_rank(cands)
    order = np.argsort(-ks, kind="stable")
    ranked = [cands[i] for i in order]
    kmax = ks[order[0]]
    keep = []
    last = kmax
    for j, i in enumerate(order):
        if ks[i] * 10 < kmax or j >= LQSEQ_MAX_COUNT or ks[i] * 2 < last:
            break
        last = ks[i]
        keep.append(cands[i])
    if len(keep) <= 1:
        return None
    if best_n > len(cands) / 3 and best_n > 1:
        return best_seq
    # seed selection by candidate size (lib/ctg_cns.c:949-957)
    if len(keep[0]) >= 20000:
        return keep[0]
    top = keep[:6] if len(keep[0]) < 3000 else keep[:2]
    from .poa import poa_consensus

    return poa_consensus(top)


def refine_seed(seed: bytes, cands: list[bytes], iterations: int = 2
                ) -> bytes:
    """Re-align top candidates to the seed and re-run the link DP on the
    mini-MSA (iterate_generate_consensus_trimed ×2)."""
    for _ in range(iterations):
        use = cands[:LQSEQ_MAX_COUNT]
        rows = _align_to_seed(use, seed)
        t_l, d_l, q_l, r_l = [], [], [], []
        offs = [0]
        aln_s, aln_e = [], []
        # seed as row 0
        t_l.append(np.arange(len(seed), dtype=np.int32))
        d_l.append(np.zeros(len(seed), dtype=np.int16))
        q_l.append(ASCII_TO_CNS[np.frombuffer(seed, dtype=np.uint8)])
        r_l.append(np.full(len(seed), 0, dtype=np.int32))
        offs.append(len(seed))
        aln_s.append(0)
        aln_e.append(len(seed) - 1)
        rid = 1
        coverage = np.ones(len(seed), dtype=np.int32)
        for row in rows:
            if row is None:
                continue
            ts, ds, qs = [], [], []
            for pos, piece in row:
                if piece == b"":
                    ts.append(pos)
                    ds.append(0)
                    qs.append(GAP)
                else:
                    for k, ch in enumerate(piece):
                        ts.append(pos)
                        ds.append(k)
                        qs.append(int(ASCII_TO_CNS[ch]))
            if not ts:
                continue
            t_arr = np.array(ts, dtype=np.int32)
            d_arr = np.array(ds, dtype=np.int16)
            q_arr = np.array(qs, dtype=np.uint8)
            np.add.at(coverage, t_arr[d_arr == 0], 1)
            t_l.append(t_arr)
            d_l.append(d_arr)
            q_l.append(q_arr)
            r_l.append(np.full(len(t_arr), rid, dtype=np.int32))
            offs.append(offs[-1] + len(t_arr))
            aln_s.append(int(t_arr[0]))
            aln_e.append(int(t_arr[-1]))
            rid += 1
        cols = TagColumns(
            np.concatenate(r_l), np.concatenate(t_l), np.concatenate(d_l),
            np.concatenate(q_l), np.array(offs, dtype=np.int64),
            np.array(aln_s, dtype=np.int32), np.array(aln_e, dtype=np.int32),
            np.arange(rid, dtype=np.int64),
        )
        edges = build_edges(cols)
        score, best = link_dp(edges, coverage, "hifi")
        cns = traceback(edges, score, best, coverage, len(seed), "hifi",
                        min_cov=0, lq_min_qv=0)
        if len(cns.base):
            seed = bytes(cns.base & 0xDF)  # uppercase
    return seed


def repair_lq_regions(cns: Consensus, cols: TagColumns, coverage, l_ins,
                      l_del, read_type: str) -> Consensus:
    """Detect + repair LQ regions; returns the spliced consensus."""
    regions = find_lq_regions(cns, coverage, l_ins, l_del, read_type)
    if not regions:
        return cns
    seeds = []
    for s, e in regions:
        cands, n_empty = extract_candidates(cols, s, e)
        seed = build_seed(cands, n_empty)
        if seed is not None and len(seed) >= 10:
            seed = refine_seed(seed, cands)
        seeds.append(seed)
    # splice (update_consensus_trimed): replace consensus bases whose pos
    # falls inside a repaired region with the region's seed
    out_pos, out_base, out_qv = [], [], []
    ri = 0
    i = 0
    n = len(cns.pos)
    while i < n:
        p = int(cns.pos[i])
        while ri < len(regions) and p > regions[ri][1]:
            ri += 1
        if ri < len(regions) and seeds[ri] is not None and (
            regions[ri][0] <= p <= regions[ri][1]
        ):
            s, e = regions[ri]
            for ch in seeds[ri]:
                out_pos.append(s)
                out_base.append(ch)
                out_qv.append(HQ_MIN_QV)
            while i < n and cns.pos[i] <= e:
                i += 1
            continue
        out_pos.append(p)
        out_base.append(int(cns.base[i]))
        out_qv.append(int(cns.qv[i]))
        i += 1
    return Consensus(np.array(out_pos, dtype=np.int32),
                     np.array(out_base, dtype=np.uint8),
                     np.array(out_qv, dtype=np.int32))
