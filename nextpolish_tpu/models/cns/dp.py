"""Second-order link DP over the MSA (get_cns_from_align_tags,
lib/ctg_cns.c:1876-2144) and consensus traceback.

Scores: score(entry m at tag t) = max(0, max_n score(n)) + 10*link(m)
        - c*coverage(p), where n ranges over entries at m's pp tag whose own
        pp equals m's ppp (the second-order chain), c = 2 (ONT), 3 (CLR/RS),
        4 (HiFi); head entries (read starts) take 10*link - c*cov directly.
The per-tag winning entry follows the read-type-specific tie rules of the
reference; the global best is the best-scoring tag at the last position.

The entry scoring pass is vectorized per (position, delta) column; the
winning-entry rules run on the column's few entries directly.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .msa import NB, EdgeTable, unpack_keys
from .tags import CNS_TO_ASCII, GAP

COV_COEF = {"ont": 2, "clr": 3, "rs": 3, "hifi": 4}
NEG = np.int64(-(10 ** 15))


@dataclass
class Consensus:
    pos: np.ndarray  # int32 window-local t_pos per consensus base
    base: np.ndarray  # uint8 ascii (lowercase = low quality)
    qv: np.ndarray  # int32 (100 * link / coverage)


def link_dp(edges: EdgeTable, coverage: np.ndarray, read_type: str):
    """Score all entries; returns (score[E], best_entry[Tn], tag ids meta).

    Mirrors the per-type selection loops (ONT :2066-2124, CLR :1935-1999,
    HIFI :2000-2064, RS :1890-1934)."""
    E = len(edges.cur)
    Tn = len(edges.tag_key)
    score = np.zeros(E, dtype=np.int64)
    best = np.zeros(Tn, dtype=np.int64)
    if not E:
        return score, best
    c = COV_COEF[read_type]

    tag_of_entry = (
        np.searchsorted(edges.tag_key, edges.cur).astype(np.int64)
    )
    is_head = edges.pp < 0
    ppid = np.searchsorted(edges.tag_key, edges.pp).astype(np.int64)
    ppid_s = np.where(is_head, np.int64(-1), ppid)  # head sorts first
    pppid = np.searchsorted(edges.tag_key, edges.ppp).astype(np.int64)
    pppid_s = np.where(edges.ppp < 0, np.int64(-1), pppid)

    # candidate ranges: entries n with (cur == pp_m, pp == ppp_m);
    # entries are sorted by (cur, pp, ppp) and tag ids are key-monotone,
    # with head (-1) ordered first — so this pair key is sorted
    B = np.int64(Tn + 2)
    pair_sorted = tag_of_entry * B + (ppid_s + 1)
    q = ppid * B + (pppid_s + 1)
    lo = np.searchsorted(pair_sorted, q, side="left")
    hi = np.searchsorted(pair_sorted, q, side="right")
    lo[is_head] = 0
    hi[is_head] = 0

    tp, td, tb = unpack_keys(edges.tag_key)
    ep, ed, eb = unpack_keys(edges.cur)
    _, pp_d, pp_b = unpack_keys(np.maximum(edges.pp, 0))
    pp_b = np.where(is_head, np.uint8(0), pp_b)
    _, ppp_d, ppp_b = unpack_keys(np.maximum(edges.ppp, 0))
    link10 = 10 * edges.link.astype(np.int64)
    covp = coverage[ep].astype(np.int64)

    # entries grouped by column (p, d): contiguous runs in sorted order
    colkey = edges.cur >> 3
    col_change = np.ones(E, dtype=bool)
    col_change[1:] = colkey[1:] != colkey[:-1]
    col_starts = np.concatenate([np.flatnonzero(col_change), [E]])

    woff = np.arange(64)

    for ci in range(len(col_starts) - 1):
        a, b = int(col_starts[ci]), int(col_starts[ci + 1])
        sl = slice(a, b)
        n_lo = lo[sl]
        n_hi = hi[sl]
        w = int(np.maximum(n_hi - n_lo, 0).max()) if b > a else 0
        w = min(w, 64)
        if w:
            idx = n_lo[:, None] + woff[None, :w]
            mask = woff[None, :w] < (n_hi - n_lo)[:, None]
            cand = np.where(mask, score[np.minimum(idx, E - 1)], NEG)
            best_pp = cand.max(axis=1)
        else:
            best_pp = np.full(b - a, NEG)
        base_val = np.where(np.asarray(is_head[sl]), 0, np.maximum(best_pp, NEG))
        sc = base_val + link10[sl] - c * covp[sl]
        # heads: direct assignment; non-heads: floor at the 0 init
        sc = np.where(is_head[sl], link10[sl] - c * covp[sl],
                      np.where(best_pp <= NEG // 2, 0,
                               np.maximum(sc, 0)))
        score[sl] = sc
    # winning entry per tag with read-type rules
    _select_best(edges, score, best, lo, hi, is_head, pp_b, ppp_b, pp_d,
                 ppp_d, eb, covp, read_type)
    return score, best


def _select_best(edges, score, best, lo, hi, is_head, pp_b, ppp_b, pp_d,
                 ppp_d, eb, covp, read_type):
    """Per-tag winning-entry selection (the C max_size bookkeeping)."""
    t_lo = edges.tag_off[:-1]
    t_hi = edges.tag_off[1:]
    multi = np.flatnonzero(t_hi - t_lo > 1)
    # single-entry tags: best stays 0
    for ti in multi:
        a, b = int(t_lo[ti]), int(t_hi[ti])
        bi = 0
        p_pp = NEG  # running best pp score (the C p_pp_score)
        tmp = int(edges.link[a:b].max()) if read_type == "ont" else 0
        for m in range(a, b):
            mi = m - a
            raiser = NEG  # p_pp_score_: the n score behind m's final score
            if not is_head[m] and hi[m] > lo[m]:
                n_best = int(score[lo[m] : hi[m]].max())
                if score[m] > 0:
                    raiser = n_best
                if read_type in ("clr", "hifi"):
                    if n_best > p_pp or (n_best == p_pp and pp_b[m] != GAP):
                        bi = mi
                        p_pp = n_best
                elif read_type == "ont":
                    cond1 = (ppp_d[m] > 1 or pp_d[m] > 0) and (
                        edges.link[m] > covp[m] * 0.2
                        or edges.link[m] > tmp / 2
                    )
                    cond2 = (
                        edges.link[m] > edges.link[a + bi] / 2
                        and n_best > p_pp
                        and (pp_b[m] == GAP or pp_b[m] == eb[m]
                             or ppp_b[m] == eb[m] or pp_b[m] == ppp_b[m])
                    )
                    if cond1 or cond2:
                        bi = mi
                        p_pp = n_best
            # the common strictly-greater / tie-upgrade rule
            if read_type == "rs":
                if score[m] >= score[a + bi]:
                    bi = mi
                    p_pp = raiser
            else:
                if score[m] > score[a + bi] or (
                    score[m] == score[a + bi] and pp_b[m] != GAP
                ):
                    bi = mi
                    p_pp = raiser
        best[ti] = bi


def traceback(edges: EdgeTable, score: np.ndarray, best: np.ndarray,
              coverage: np.ndarray, length: int, read_type: str,
              min_cov: int = 4, lq_min_qv: int = 20) -> Consensus:
    """Global best at the last position, then follow winning pp pointers
    (generate_cns_from_best_score, lib/ctg_cns.c:1828-1874)."""
    Tn = len(edges.tag_key)
    tp, td, tb = unpack_keys(edges.tag_key)
    last = np.flatnonzero(tp == length - 1)
    if not last.size:
        return Consensus(np.empty(0, np.int32), np.empty(0, np.uint8),
                         np.empty(0, np.int32))
    bs = score[edges.tag_off[last] + best[last]]
    # >= with later-wins: take the last argmax
    gi = int(last[len(bs) - 1 - int(np.argmax(bs[::-1]))])

    pos_l, base_l, qv_l = [], [], []
    ti = gi
    guard = 0
    maxn = int(edges.tag_off[-1]) + length + 8
    while guard < maxn:
        guard += 1
        e = int(edges.tag_off[ti] + best[ti])
        if tb[ti] != GAP:
            cov = max(int(coverage[tp[ti]]), 1)
            qv = 100 * int(edges.link[e]) // cov
            ch = CNS_TO_ASCII[tb[ti]]
            if not (coverage[tp[ti]] > min_cov and qv > lq_min_qv):
                ch = ch + 32 if ch < 97 else ch
            pos_l.append(int(tp[ti]))
            base_l.append(int(ch))
            qv_l.append(qv)
        nxt = edges.pp[e]
        if nxt < 0:
            break
        ti = int(np.searchsorted(edges.tag_key, nxt))
        if ti >= Tn or edges.tag_key[ti] != nxt:
            break
    pos = np.array(pos_l[::-1], dtype=np.int32)
    base = np.array(base_l[::-1], dtype=np.uint8)
    qv = np.array(qv_l[::-1], dtype=np.int32)
    return Consensus(pos, base, qv)
