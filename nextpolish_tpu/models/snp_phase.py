"""Task 3 — diploid SNP detection and phasing (snp_phase, lib/snpphase.c).

Per contig:
  1. single-base pileup from short reads at filter level 2 (the reference
     parses with shift=16 so each cell counts bases, :94);
  2. SNP detection by top-2 base ratio (ts_find_snps :136-203, decision
     rule ts_check_snps :205-214) with FLAG_ZERO/FLAG_DEPTH marking;
  3. SNP re-validation: per-site region strings re-voted from short reads,
     long reads added when support is weak (ts_fliter_snps :216-349);
  4. low-depth regions re-corrected with the chain DP over short+long
     reads at the lgs balance factor, with FLAG_THIRD marking
     (ts_correct_lower_depth :797-841, ts_region_correct :843-871);
  5. SNP-pair linkage counting from reads spanning adjacent SNPs, long
     reads confirming weak links (ts_find_snps_link :351-421);
  6. Viterbi over the SNP chain, 2 haplotype states per site, score
     n*log10((mapq+qual)/n + 2) - total/ploidy (ts_snps_score :450-516),
     then phase-consistent correction (ts_snps_correct :518-556).

The task is experimental in the reference (doc/FAQ.rst:24-27).  Round-1
simplifications (documented inline): long-read confirmation accepts
spanning reads without the left/right base check, and link extraction
compares read substrings per site pair directly instead of the streaming
state machine.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..io.bam import AlnBatch
from ..io.fasta import ASCII_TO_NIB
from ..ops import pileup as pl
from ..ops.symbols import DEL, S
from .contig_state import ContigState, find_regions, merge_regions
from .flags import FLAG_DEPTH, FLAG_SNP, FLAG_THIRD, FLAG_ZERO
from .score_chain import AlgoConfig, run_chain_region

SNP_NUM = 2
READ_MAPQ = 60
BASE_QUAL = 41


@dataclass
class SnpSite:
    pos: int
    left: int
    right: int
    regions: list  # up to SNP_NUM candidate strings (bytes of compact syms)
    links: dict = field(default_factory=dict)  # (i0+1, i1+1) -> [n, mapq, qual]
    total: int = 0


def _suffix_counts(counts: np.ndarray) -> np.ndarray:
    return counts.reshape(-1, S * S, S).sum(axis=1, dtype=np.int64)


def _check_snps(cfg: AlgoConfig, count: int, rate: float, is_ref: bool
                ) -> int:
    if rate < cfg.min_snp_factor_sgs and is_ref:
        return 0
    if rate == 0 or (count >= cfg.min_count_snp and not is_ref
                     and rate < cfg.min_snp_factor_sgs):
        return 2
    return 1


def snp_phase_contig(name: str, draft: bytes, sgs_batch: AlnBatch,
                     lgs_batch, cfg: AlgoConfig) -> bytes:
    batch = sgs_batch
    tid = batch.header.name2id(name)
    L = len(draft)
    sgs_levels = pl.filter_sgs(batch, cfg.read_tlen, cfg.max_clip_ratio_sgs,
                               cfg.min_map_quality)
    index = pl.build_cell_index(batch, sgs_levels, tid, 0, L - 1)
    state = ContigState.from_draft(name, draft, index)
    contig_nib = ASCII_TO_NIB[np.frombuffer(draft, dtype=np.uint8)]
    pile = pl.build_pileup(batch, sgs_levels, 2, index, tid, contig_nib,
                           cfg.trim_len_edge)
    # single-base counts per cell; the draft's own +1 is removed (the C
    # shift-16 parse does not run contig_as_read)
    bc = _suffix_counts(pile.counts.astype(np.int64))
    dp = np.arange(index.n_cells_dp)
    ref_sym = pile.ref_sym[: index.n_cells_dp]
    bc[dp, ref_sym] -= 1
    total = bc.sum(axis=1)

    n_dp = index.n_cells_dp
    state.update_flags(dp, total[:n_dp] == 0, FLAG_ZERO)
    state.update_flags(dp, total[:n_dp] <= cfg.min_depth_snp, FLAG_DEPTH)

    # SNP detection on position cells
    sites: list[SnpSite] = []
    order = np.argsort(-bc[:n_dp], axis=1, kind="stable")
    c1 = np.take_along_axis(bc[:n_dp], order[:, :1], axis=1)[:, 0]
    c2 = np.take_along_axis(bc[:n_dp], order[:, 1:2], axis=1)[:, 0]
    rate = np.where(c2 > 0, c2 / np.maximum(c1, 1), 0.0)
    is_insert = index.is_insert_cell()[:n_dp]
    cell_pos = index.cell_pos()[:n_dp]
    base_cur = state.base[:n_dp]
    last_clear = 0
    pending: list[SnpSite] = []
    for c in np.flatnonzero(total[:n_dp] > 0):
        fl = _check_snps(cfg, int(total[c]), float(rate[c]),
                         int(order[c, 0]) == int(base_cur[c]))
        if fl == 2:
            state.base[c] = order[c, 0]
        elif fl == 1 and not is_insert[c]:
            p = int(cell_pos[c])
            if not (state.flag[index.cell_of[p]] & FLAG_SNP):
                state.flag[index.cell_of[p]] |= FLAG_SNP
                regions = [bytes([int(order[c, 0])])]
                if c2[c] > 0:
                    regions.append(bytes([int(order[c, 1])]))
                else:
                    regions.append(bytes([int(base_cur[c])]))
                site = SnpSite(p, last_clear, L - 1, regions)
                sites.append(site)
                pending.append(site)
        if fl != 1 and not is_insert[c]:
            p = int(cell_pos[c])
            if not (state.flag[index.cell_of[p]] & FLAG_SNP):
                if index.ins_len[p] == 0:
                    last_clear = p
                    for s_ in pending:
                        s_.right = p
                    pending = []

    # low-depth regions -> lgs rescue later
    nodepth = merge_regions(
        find_regions(state, 0, L - 1, gap=cfg.ext_len_edge, con=0,
                     flag_bit=FLAG_DEPTH, extend=False,
                     ext_len_edge=cfg.ext_len_edge)
    )

    lgs_levels = (pl.filter_lgs(lgs_batch, cfg.max_clip_ratio_lgs)
                  if lgs_batch is not None else None)

    # SNP re-validation (ts_fliter_snps)
    sites = _filter_snps(state, sites, batch, sgs_levels, lgs_batch,
                         lgs_levels, tid, bc, total, cfg)

    # low-depth chain rescue with sgs level-2 + lgs reads
    for s_, e_ in nodepth:
        _correct_lower_depth(state, batch, sgs_levels, lgs_batch, lgs_levels,
                             tid, contig_nib, s_, e_, cfg)

    if len(sites) > 1:
        _find_links(state, sites, batch, sgs_levels, lgs_batch, lgs_levels,
                    tid, cfg)
        _phase(state, sites, cfg)

    return state.emit(FLAG_THIRD)


def _site_string(ex: pl.Expanded, row: int, length: int):
    lo, hi = ex.row_off[row], ex.row_off[row + 1]
    if hi - lo != length or (hi > lo and ex.cells[lo] != 0):
        return None
    return ex.syms[lo:hi].tobytes()


def _filter_snps(state, sites, batch, sgs_levels, lgs_batch, lgs_levels,
                 tid, bc, total, cfg):
    """ts_fliter_snps: re-vote ambiguous SNPs, adding long reads when the
    short-read support is weak."""
    index = state.index
    kept = []
    for site in sites:
        p = site.pos
        has_ins = index.ins_len[p] > 0
        s_, e_ = (p, p + 1) if has_ins else (p, p)
        view = index.region_view(s_, min(e_, index.end))
        length = view.n_cells_dp
        groups: dict[bytes, list] = {}
        tot = 0
        if has_ins:
            ex = pl.expand_reads(batch, sgs_levels, 2, view, tid,
                                 cfg.trim_len_edge, order_by_pos=True)
            for r in range(len(ex.ridx)):
                ss = _site_string(ex, r, length)
                if ss is None:
                    continue
                rid = ex.ridx[r]
                g = groups.setdefault(ss, [0, 0, 0])
                g[0] += 1
                g[1] += int(batch.mapq[rid])
                qidx = ex.qidx[ex.row_off[r] : ex.row_off[r + 1]]
                hq = qidx >= 0
                if hq.any():
                    g[2] += int(batch.qual[batch.qual_off[rid]
                                           + qidx[hq]].mean())
                tot += 1
        else:
            c = int(index.cell_of[p])
            for b in range(S):
                n = int(bc[c, b])
                if n > 0:
                    groups[bytes([b])] = [n, READ_MAPQ * n, BASE_QUAL * n]
            tot = int(total[c])
        if tot <= cfg.min_count_snp and lgs_batch is not None:
            # weak support: add spanning long reads (simplified: no
            # left/right base confirmation)
            ex = pl.expand_reads(lgs_batch, lgs_levels, 1, view, tid,
                                 cfg.trim_len_edge, order_by_pos=True)
            for r in range(len(ex.ridx)):
                ss = _site_string(ex, r, length)
                if ss is None:
                    continue
                rid = ex.ridx[r]
                g = groups.setdefault(ss, [0, 0, 0])
                g[0] += 1
                g[1] += int(lgs_batch.mapq[rid])
                tot += 1
        if not groups:
            kept.append(site)
            continue
        ranked = sorted(groups.items(),
                        key=lambda kv: (kv[1][0], kv[1][1], kv[1][2]),
                        reverse=True)
        c1 = ranked[0][1][0]
        c2 = ranked[1][1][0] if len(ranked) > 1 else 0
        rate = c2 / c1 if c1 else 0.0
        cur = bytes([int(state.base[index.cell_of[p]])])
        if has_ins:
            cur = cur + bytes([DEL]) * (length - 1)
        fl = _check_snps(cfg, tot, rate, ranked[0][0] == cur)
        if fl == 1:
            site.regions = [ranked[0][0],
                            ranked[1][0] if len(ranked) > 1 else cur]
            site.length = length
            kept.append(site)
        else:
            if fl == 2:
                cells = int(index.cell_of[p]) + np.arange(length)
                state.base[cells] = np.frombuffer(ranked[0][0],
                                                  dtype=np.uint8)
            state.flag[index.cell_of[p]] &= 0xFF ^ FLAG_SNP
    return kept


def _correct_lower_depth(state, batch, sgs_levels, lgs_batch, lgs_levels,
                         tid, contig_nib, s_, e_, cfg):
    """ts_correct_lower_depth + ts_region_correct: fresh 3-mer pileup from
    sgs level-2 + lgs level-1 reads, chain DP at the lgs balance factor,
    FLAG_THIRD marking from merged base-count ratios."""
    index = state.index
    view = index.region_view(s_, e_)
    cell0 = int(index.cell_of[s_ - index.start])
    p = pl.build_pileup(batch, sgs_levels, 2, view, tid, contig_nib,
                        cfg.trim_len_edge)
    if lgs_batch is not None:
        p = pl.add_reads_to_pileup(p, lgs_batch, lgs_levels, 1, tid,
                                   cfg.trim_len_edge)
    n_dp = view.n_cells_dp
    choice = run_chain_region(p.counts, p.refkmer, p.total, n_dp,
                              cfg.indel_balance_factor_lgs)
    cells = cell0 + np.arange(n_dp)
    is_ins = view.is_insert_cell()[:n_dp]
    zero = (state.flag[cells] & FLAG_ZERO) != 0
    use = zero | (~is_ins & (choice != DEL))
    state.base[cells[use]] = choice[use]
    # FLAG_THIRD from merged per-base counts (base_merge_kmer + nlargest)
    bcc = _suffix_counts(p.counts[:n_dp].astype(np.int64))
    order = np.argsort(-bcc, axis=1, kind="stable")
    c1 = np.take_along_axis(bcc, order[:, :1], axis=1)[:, 0]
    c2 = np.take_along_axis(bcc, order[:, 1:2], axis=1)[:, 0]
    nz2 = bcc.astype(bool).sum(axis=1) >= 2
    rate = np.where(c1 > 0, c2 / np.maximum(c1, 1), 0.0)
    b = state.base[cells]
    cond = nz2 & ((order[:, 0] != b) | (rate > cfg.max_indel_factor_lgs))
    third = cond & ((b == DEL) | is_ins | (order[:, 0] != b)
                    | (rate > cfg.max_snp_factor_lgs))
    clear = cond & ~third
    state.flag[cells[third]] |= FLAG_THIRD
    state.flag[cells[clear]] &= 0xFF ^ FLAG_THIRD


def _read_string_at(ex: pl.Expanded, row: int, view, length: int):
    """Row substring over the first `length` cells if fully covered."""
    lo, hi = ex.row_off[row], ex.row_off[row + 1]
    if lo == hi:
        return None
    cells = ex.cells[lo:hi]
    if cells[0] > 0 or cells[-1] < length - 1:
        return None
    sel = cells < length
    return ex.syms[lo:hi][sel].tobytes()


def _find_links(state, sites, batch, sgs_levels, lgs_batch, lgs_levels, tid,
                cfg):
    """Link counting between adjacent SNP sites from spanning reads."""
    index = state.index

    def count_pass(b, levels, level, weak_only):
        for i in range(1, len(sites)):
            s0, s1 = sites[i - 1], sites[i]
            if weak_only and s1.total > cfg.min_count_snp_link:
                continue
            lo, hi = s0.pos, s1.pos
            view = index.region_view(lo, min(hi + 1, index.end))
            len0 = len(s0.regions[0])
            len1 = len(s1.regions[0])
            cell1 = int(index.cell_of[hi - index.start]
                        - index.cell_of[lo - index.start])
            ex = pl.expand_reads(b, levels, level, view, tid,
                                 cfg.trim_len_edge, order_by_pos=True)
            for r in range(len(ex.ridx)):
                a, z = ex.row_off[r], ex.row_off[r + 1]
                if a == z:
                    continue
                cells = ex.cells[a:z]
                if cells[0] > 0 or cells[-1] < cell1 + len1 - 1:
                    continue
                syms = ex.syms[a:z]
                str0 = syms[(cells >= 0) & (cells < len0)].tobytes()
                str1 = syms[(cells >= cell1)
                            & (cells < cell1 + len1)].tobytes()
                try:
                    i0 = s0.regions.index(str0)
                    i1 = s1.regions.index(str1)
                except ValueError:
                    continue
                rid = ex.ridx[r]
                key = (i0 + 1, i1 + 1)
                g = s1.links.setdefault(key, [0, 0, 0])
                g[0] += 1
                g[1] += int(b.mapq[rid])
                qidx = ex.qidx[a:z]
                hq = qidx >= 0
                if hq.any():
                    g[2] += int(b.qual[b.qual_off[rid] + qidx[hq]].mean())
                s1.total += 1

    count_pass(batch, sgs_levels, 2, weak_only=False)
    if lgs_batch is not None:
        count_pass(lgs_batch, lgs_levels, 1, weak_only=True)


def _phase(state, sites, cfg):
    """2-state Viterbi over the SNP chain + phased correction
    (ts_snps_score + ts_snps_correct)."""
    n = len(sites)
    NEG = -1e30
    score = np.zeros((n, SNP_NUM + 1))
    back = np.zeros((n, SNP_NUM + 1), dtype=np.int64)
    score[0, 1:] = 0.0
    score[0, 0] = NEG
    for i in range(1, n):
        q = sites[i]
        score[i, :] = NEG
        if q.links:
            used_to = set()
            for (a, b), (num, mapq, qual) in q.links.items():
                sc = (score[i - 1, a]
                      + num * math.log10((mapq + qual) / num + 2)
                      - q.total / cfg.ploidy)
                if sc > score[i, b]:
                    score[i, b] = sc
                    back[i, b] = a
                    used_to.add(b)
            # complementary filling for unlinked states (:494-507)
            used_from = {int(back[i, b]) for b in range(1, SNP_NUM + 1)
                         if score[i, b] > NEG / 2}
            for b in range(1, SNP_NUM + 1):
                if score[i, b] > NEG / 2:
                    continue
                for a in range(1, SNP_NUM + 1):
                    if a not in used_from:
                        score[i, b] = score[i - 1, a] - q.total / cfg.ploidy
                        back[i, b] = a
                        break
        else:
            score[i, 1:] = 0.0
            back[i, 1:] = 0

    # backtrack, writing phased strings (only across linked stretches)
    index = state.index
    cur = None
    for i in range(n - 1, 0, -1):
        q = sites[i]
        if not q.links:
            cur = None
            continue
        if cur is None:
            cur = int(np.argmax(score[i, 1:]) + 1)
            _write_site(state, index, q, cur)
        prev = int(back[i, cur])
        if prev == 0:
            prev = 1
        _write_site(state, index, sites[i - 1], prev)
        cur = prev if sites[i - 1].links else None


def _write_site(state, index, site: SnpSite, hap: int):
    region = site.regions[hap - 1]
    c0 = int(index.cell_of[site.pos - index.start])
    cells = c0 + np.arange(len(region))
    state.base[cells] = np.frombuffer(region, dtype=np.uint8)
