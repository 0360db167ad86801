"""Window loop for the consensus engine (ctg_cns_core, lib/ctg_cns.c:3399).

Per window [s, e): reference row + filtered read tags -> MSA edges -> link
DP -> consensus; low-quality regions are re-built from candidate substrings
via POA seeding + re-alignment (lq.py/refine.py).  Windows overlap by
`overlap` and are stitched on an exact-match anchor (link_consensus role).

The structural-variant layer (SA-tag gap clusters, random-read depth track,
contig splitting) activates for contigs > 100 kb in the reference; it is
not implemented yet — windows run with empty cluster state (matches the
reference behavior for contigs under INS_MIN_CHECK_LEN).
"""
from __future__ import annotations

import numpy as np

from ...io.bam import AlnBatch
from ...ops.pileup import region_overlap_mask
from .dp import Consensus, link_dp, traceback
from .msa import EdgeTable, build_edges, pack_keys
from .tags import TagColumns, build_tags, reference_row

MAX_CLIP_RATIO = {"hifi": 0.1, "ont": 0.7, "clr": 0.7, "rs": 0.7}
GAP_MIN_LEN = {"ont": 3, "hifi": 5, "clr": 5, "rs": 5}


def cal_win_len(w: int, s: int, length: int) -> int:
    """Balanced window length (lib/ctg_cns.c:2800-2807)."""
    if length <= w:
        return length
    n = int((length - s) / (w - s) + 0.999)
    return int((length + (n - 1) * s) / n + 0.999)


def select_window_reads(batch: AlnBatch, tid: int, s: int, e: int,
                        read_type: str) -> np.ndarray:
    """Window read filter (ctg_cns_core :3507-3514): primary mapped reads
    with aligned fraction above MAX_CLIP_RATIO."""
    m = region_overlap_mask(batch, tid, s, max(e - 1, s))
    m &= (batch.flag & 0xD04) == 0
    left, right = batch.clip_lens()
    lq = np.maximum(batch.lqseq.astype(np.int64), 1)
    aligned_frac = (lq - left - right) / lq
    m &= aligned_frac > MAX_CLIP_RATIO[read_type]
    return np.flatnonzero(m)


def window_consensus(batch: AlnBatch, tid: int, contig_ascii: np.ndarray,
                     s: int, e: int, read_type: str, min_cov: int = 4,
                     repair: bool = True):
    """One window's consensus (pos window-local)."""
    ridx = select_window_reads(batch, tid, s, e, read_type)
    cols, coverage, l_ins, l_del, max_delta, kept = build_tags(
        batch, ridx, contig_ascii, s, e,
        gap_min_len=GAP_MIN_LEN[read_type]
    )
    L = e - s
    # reference row (contributes tags and +1 coverage everywhere)
    rt, rd, rq = reference_row(contig_ascii, s, e)
    coverage = coverage + 1
    ref_cols = TagColumns(
        read_of=np.full(L, -1, np.int32),
        t_pos=rt, delta=rd, q_base=rq,
        row_off=np.array([0, L], dtype=np.int64),
        aln_t_s=np.array([0], dtype=np.int32),
        aln_t_e=np.array([L - 1], dtype=np.int32),
        ridx=np.array([-1], dtype=np.int64),
    )
    merged = _concat_cols([ref_cols, cols])
    # HIFI's _lq flow marks low-qv with DAG_MIN_QV=80 (:1794-1798)
    lq_min_qv = 80 if read_type == "hifi" else 20
    from ...native import cns_dp as native_cns_dp

    nat = native_cns_dp(merged.t_pos, merged.delta, merged.q_base,
                        merged.row_off, coverage, L, read_type, min_cov,
                        lq_min_qv)
    if nat is not None:
        cns = Consensus(nat[0], nat[1], nat[2])
    else:
        edges = build_edges(merged)
        score, best = link_dp(edges, coverage, read_type)
        cns = traceback(edges, score, best, coverage, L, read_type, min_cov,
                        lq_min_qv=lq_min_qv)
    if repair and len(cns.pos):
        if read_type == "hifi":
            from .lqrepair import repair_hifi

            cns = repair_hifi(cns, merged, coverage)
        else:
            from .lqrepair import repair as exact_repair

            cns = exact_repair(cns, merged, coverage, l_ins, l_del,
                               read_type)
    return cns


def _concat_cols(parts):
    t = np.concatenate([p.t_pos for p in parts])
    d = np.concatenate([p.delta for p in parts])
    q = np.concatenate([p.q_base for p in parts])
    r = np.concatenate([p.read_of for p in parts])
    offs = [np.zeros(1, dtype=np.int64)]
    base = 0
    aln_s, aln_e, ridx = [], [], []
    for p in parts:
        offs.append(p.row_off[1:] + base)
        base += p.row_off[-1]
        aln_s.append(p.aln_t_s)
        aln_e.append(p.aln_t_e)
        ridx.append(np.asarray(p.ridx, dtype=np.int64))
    return TagColumns(r, t, d, q, np.concatenate(offs),
                      np.concatenate(aln_s), np.concatenate(aln_e),
                      np.concatenate(ridx))


def stitch(parts: list[tuple[int, Consensus]], overlap: int, k: int = 50
           ) -> bytes:
    """Join window consensi on a k-base exact anchor inside the overlap —
    exact port of link_consensus (lib/ctg_cns.c:3121-3223, split inactive).

    parts: [(window_start aka uncorrected_len, Consensus)] in order."""
    n = len(parts)
    if n == 0:
        return b""
    lstrip = [0] * n
    rstrip = [0] * n
    s_half = overlap // 2
    for i in range(n - 1):
        cur_p, cur = parts[i]
        nxt_p, nxt = parts[i + 1]
        cpos, cbase = cur.pos, cur.base
        npos, nbase = nxt.pos, nxt.base
        cl = len(cpos)
        rs = ls = s_half
        while cpos[cl - rs] < cpos[cl - 1] - s_half:
            rs -= 1
        while cpos[cl - rs] > cpos[cl - 1] - s_half:
            rs += 1
        while npos[ls] < npos[0] + s_half:
            ls += 1
        while npos[ls] > npos[0] + s_half:
            ls -= 1
        l = 0
        p = nxt_p - cur_p
        guard = 0
        limit = (cl + len(npos)) * 2 + 1000
        while l < k:
            guard += 1
            if guard > limit:
                raise RuntimeError("window stitch found no anchor")
            j = int(cpos[cl - rs]) - int(npos[ls])
            if j == p and cbase[cl - rs] == nbase[ls]:
                l += 1
                ls -= 1
                rs += 1
            else:
                l = 0
                if j > p:
                    ls += 1
                elif j < p:
                    ls -= 1
                else:
                    d = int(cpos[cl - rs]) + cur_p - 1
                    while int(cpos[cl - rs]) + cur_p > d:
                        rs += 1
                    while int(npos[ls]) + nxt_p > d:
                        ls -= 1
        rstrip[i] = rs
        lstrip[i + 1] = ls
    if n > 1:
        rstrip[n - 2] -= k
        lstrip[n - 1] += k
    out = bytearray()
    for i in range(n):
        cns = parts[i][1]
        out += cns.base[lstrip[i] : len(cns.pos) - rstrip[i]].tobytes()
    return bytes(out)


def consensus_for_contig(batch: AlnBatch, tid: int, contig: bytes,
                         read_type: str, window: int = 5_000_000,
                         overlap: int = 1_000_000, min_cov: int = 4,
                         repair: bool = True) -> bytes:
    """Whole-contig consensus: window loop + stitch (ctg_cns_core)."""
    contig_ascii = np.frombuffer(contig.upper(), dtype=np.uint8)
    length = len(contig)
    b = cal_win_len(window, overlap, length)
    parts = []
    s = 0
    e = 0
    while e < length:
        e = min(s + b, length)
        cns = window_consensus(batch, tid, contig_ascii, s, e, read_type,
                               min_cov, repair)
        parts.append((s, cns))
        s = e - overlap
    return stitch(parts, overlap)
