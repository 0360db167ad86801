"""Task 1 — short-read score-chain correction (lib/scorechain.c:3-15).

Pipeline per contig:
  read filter level (contig_read_fliter1) -> insert-slot discovery -> dense
  pileup counts -> tropical chain scan on device -> corrected bases + flags
  -> FASTA emission with FLAG_ZERO|FLAG_COVERAGE lowercasing.

Also provides `score_correct_region`, the shared regional correction used by
the kmer_count no-depth rescue (contig_score_correct, lib/contig.c:706-734)
and the long-read chain variant (td_score_chain1, lib/scorechain.c:17-29).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.bam import AlnBatch
from ..io.fasta import ASCII_TO_NIB
from ..ops import pileup as pl
from ..ops.symbols import K3, S
from ..ops.tropical import chain_correct, init_state, pad_to_chunk
from .contig_state import (ContigState, find_regions, maybe_trace,
                           merge_regions)
from .flags import FLAG_COVERAGE, FLAG_ZERO


@dataclass
class AlgoConfig:
    """Algorithm thresholds (C Configure defaults, lib/config.c:10-41)."""

    trim_len_edge: int = 2
    ext_len_edge: int = 2
    min_map_quality: int = 0
    indel_balance_factor_sgs: float = 0.5
    min_count_ratio_skip: float = 0.8
    min_len_ldr: int = 3
    min_len_inter_kmer: int = 5
    max_len_kmer: int = 50
    max_count_kmer: int = 50
    indel_balance_factor_lgs: float = 0.33
    max_clip_ratio_sgs: float = 0.15
    max_clip_ratio_lgs: float = 0.4
    max_ins_len_sgs: int = 10000
    max_ins_fold_sgs: int = 5
    count_read_ins_sgs: int = 10000
    min_depth_snp: int = 3
    min_count_snp: int = 5
    min_count_snp_link: int = 5
    ploidy: float = 2.0
    max_indel_factor_lgs: float = 0.21
    max_snp_factor_lgs: float = 0.53
    min_snp_factor_sgs: float = 0.34
    max_variant_count_lgs: int = 150000
    read_tlen: int = 0  # estimated insert size * max_ins_fold_sgs
    read_len: int = 0  # first read's length (Configure.read_len)
    # -debug (trace_polish_open, lib/config.c:40): when a list, engines
    # append (name, pos, index, curbase, draftbase) per changed base
    trace_sink: list | None = None


def estimate_read_tlen(batch: AlnBatch, cfg: AlgoConfig) -> int:
    """Mean insert size from the first ~10k proper pairs * max_ins_fold_sgs
    (bam_tlen, lib/config.c:80-101 — including its count-from-1 average)."""
    tl = batch.tlen
    sel = (tl > 0) & (tl < cfg.max_ins_len_sgs)
    take = np.flatnonzero(sel)[: cfg.count_read_ins_sgs - 1]
    count = len(take) + 1
    mean = int(tl[take].sum()) // count
    if len(batch):
        cfg.read_len = int(batch.lqseq[0])
    return mean * cfg.max_ins_fold_sgs


def _coverage_of(counts: np.ndarray, choice: np.ndarray) -> np.ndarray:
    """Per-cell count supporting the chosen base (base_get_coverage,
    lib/base.c:79-89) — sum of the chosen suffix lane only (gathering the
    lane first avoids reducing all S lanes of the big counts tensor)."""
    n = len(choice)
    lane = counts.reshape(n, S * S, S)[np.arange(n), :, choice.astype(np.int64)]
    return lane.sum(axis=1, dtype=np.int64)


def run_chain_region(counts: np.ndarray, refkmer: np.ndarray,
                     total: np.ndarray, n_dp: int, rate: float,
                     rank: np.ndarray | None = None) -> np.ndarray:
    from ..ops.tropical import run_chain

    return run_chain(counts, refkmer, total, n_dp, rate, rank=rank)


def score_correct_region(state: ContigState, batch: AlnBatch,
                         levels: np.ndarray, tid: int,
                         contig_nib: np.ndarray, start: int, end: int,
                         filterlevel: int, rate: float, cfg: AlgoConfig
                         ) -> None:
    """contig_score_correct (lib/contig.c:706-734) on [start, end], assuming
    insert slots already exist in state.index.  Mutates state in place."""
    view = state.index.region_view(start, end)
    cell0 = int(state.index.cell_of[start - state.index.start])
    p = pl.build_pileup_sparse(batch, levels, filterlevel, view, tid,
                               contig_nib, cfg.trim_len_edge)
    _apply_correction_sparse(state, p, cell0, rate, cfg)

    if filterlevel == 2:
        # no-depth rescue: re-parse FLAG_ZERO runs at filter level 1
        # (lib/contig.c:721-733); all regions run in one batched launch
        nodepth = find_regions(state, start, end, gap=0, con=0,
                               flag_bit=FLAG_ZERO, extend=False,
                               ext_len_edge=cfg.ext_len_edge)
        problems = []
        metas = []
        for rs, re in merge_regions(nodepth):
            sub = state.index.region_view(rs, re)
            sub_cell0 = int(state.index.cell_of[rs - state.index.start])
            lo = sub_cell0 - cell0
            hi = lo + sub.n_cells_dp
            ex = pl.expand_reads(batch, levels, 1, sub, tid,
                                 cfg.trim_len_edge)
            extra = pl.sparse_counts(ex.cells, ex.kmers(), sub.n_cells)
            counts = np.minimum(
                p.dense_window(lo, hi).astype(np.int32)
                + extra[: sub.n_cells_dp], 0xFFFF
            ).astype(np.uint16)
            total = p.total[lo:hi] + np.bincount(
                ex.cells, minlength=sub.n_cells
            )[: sub.n_cells_dp].astype(np.int32)
            # ranks: the level-2 parse's data lists persist; level-1 kmers
            # append after them (lib/contig.c:721-733, no base_clean_data)
            rank = pl.event_ranks(
                ex.cells[ex.cells < sub.n_cells_dp],
                ex.kmers()[ex.cells < sub.n_cells_dp].astype(np.int64),
                sub.n_cells_dp, base_ndistinct=p.ndistinct(lo, hi),
                base_rank=p.rank_window(lo, hi))
            problems.append((counts, p.refkmer[lo:hi], total, rank))
            metas.append((sub, sub_cell0, counts, total))
        from ..ops.tropical import run_chain_batch

        for choice, (sub, sub_cell0, counts, total) in zip(
                run_chain_batch(problems, rate), metas):
            _apply_choice(state, sub.n_cells_dp, choice, counts, total,
                          sub_cell0, cfg)


def _apply_correction_sparse(state: ContigState, p, cell0: int, rate: float,
                             cfg: AlgoConfig) -> None:
    from ..ops.tropical import dispatch_chain_sparse

    n_dp = p.index.n_cells_dp
    dev = dispatch_chain_sparse(p.uk, p.cn, p.rk, p.refkmer, p.total, n_dp,
                                rate, cov_ratio=cfg.min_count_ratio_skip)
    _finish_correction_sparse(state, p, cell0, dev, cfg)


def _finish_correction_sparse(state: ContigState, p, cell0: int, dev,
                              cfg: AlgoConfig) -> None:
    """Unpack the device result byte: choice in bits 0-2, FLAG_ZERO /
    FLAG_COVERAGE decisions in bits 3-4 (computed on device with the exact
    integer-threshold equivalent of the host's f64 compares)."""
    from ..ops.tropical import FLAGB_COV, FLAGB_ZERO

    n_dp = p.index.n_cells_dp
    packed = np.asarray(dev)[:n_dp]
    cells = cell0 + np.arange(n_dp)
    state.base[cells] = packed & 7
    state.update_flags(cells, (packed >> FLAGB_ZERO) & 1 == 1, FLAG_ZERO)
    state.update_flags(cells, (packed >> FLAGB_COV) & 1 == 1, FLAG_COVERAGE)


def _apply_choice(state: ContigState, n_dp: int, choice: np.ndarray,
                  counts: np.ndarray, total_arr: np.ndarray, cell0: int,
                  cfg: AlgoConfig) -> None:
    cells = cell0 + np.arange(n_dp)
    state.base[cells] = choice[:n_dp]
    total = total_arr[:n_dp].astype(np.int64)
    state.update_flags(cells, total == 1, FLAG_ZERO)
    cov = _coverage_of(counts[:n_dp], choice[:n_dp])
    low = cov < cfg.min_count_ratio_skip * np.maximum(total, 1)
    state.update_flags(cells, low, FLAG_COVERAGE)


def _apply_correction(state: ContigState, p: pl.Pileup, cell0: int,
                      rate: float, cfg: AlgoConfig) -> None:
    """Chain DP + base/flag update (contig_region_score + _region_correct)."""
    n_dp = p.index.n_cells_dp
    choice = run_chain_region(p.counts, p.refkmer, p.total, n_dp, rate,
                              rank=p.rank)
    _apply_choice(state, n_dp, choice, p.counts, p.total, cell0, cfg)


def score_chain_contig_begin(name: str, draft: bytes, batch: AlnBatch,
                             cfg: AlgoConfig, levels=None, device=None):
    """Pipelined task-1 entry, stage 1: host pileup + async DP dispatch.

    Returns a handle for score_chain_contig_end.  While the device runs
    this contig's chain scan, the caller can begin() the next contig —
    the host pileup walk and the device DP overlap (the two are roughly
    equal cost, so the pipeline nearly doubles multi-contig throughput)."""
    from ..ops.tropical import dispatch_chain_sparse

    tid = batch.header.name2id(name)
    L = len(draft)
    if levels is None:
        levels = pl.filter_sgs_chain(batch)
    index = pl.build_cell_index(batch, levels, tid, 0, L - 1)
    state = ContigState.from_draft(name, draft, index)
    contig_nib = ASCII_TO_NIB[np.frombuffer(draft, dtype=np.uint8)]
    view = state.index.region_view(0, L - 1)
    cell0 = int(state.index.cell_of[0 - state.index.start])
    p = pl.build_pileup_sparse(batch, levels, 1, view, tid, contig_nib,
                               cfg.trim_len_edge)
    dev = dispatch_chain_sparse(p.uk, p.cn, p.rk, p.refkmer, p.total,
                                p.index.n_cells_dp,
                                cfg.indel_balance_factor_sgs,
                                cov_ratio=cfg.min_count_ratio_skip,
                                device=device)
    return state, p, cell0, dev, cfg, draft


def score_chain_contig_end(handle) -> bytes:
    """Pipelined task-1 entry, stage 2: fetch the DP result, apply flags,
    emit the polished sequence."""
    from ..runtime import trace

    state, p, cell0, dev, cfg, draft = handle
    with trace.timed("task1.wait"):
        packed = np.asarray(dev)
    with trace.timed("task1.host"):
        _finish_correction_sparse(state, p, cell0, packed, cfg)
        maybe_trace(cfg, state.name, state, draft)
        return state.emit(FLAG_ZERO | FLAG_COVERAGE)


def score_chain_contig(name: str, draft: bytes, batch: AlnBatch,
                       cfg: AlgoConfig) -> bytes:
    """Task 1 entry for one contig: polished sequence bytes
    (score_chain, lib/scorechain.c:3-15)."""
    return score_chain_contig_end(
        score_chain_contig_begin(name, draft, batch, cfg))


def score_chain_pipeline(names_seqs, batch, cfg: AlgoConfig):
    """Software-pipelined task 1 over contigs (the TPU analog of the
    reference's multiprocessing Pool over contigs, lib/nextpolish1.py:223-224).
    Three overlapped stages per contig:

      prep (worker thread): BAM fetch + cell index + native pileup walk —
            the ctypes call releases the GIL, so it runs concurrently with
            the main thread;
      device: chain DP dispatched async; the result starts streaming to the
            host immediately (start_host_copy) so the final fetch costs ~0
            RTT on the tunneled backend;
      finish (main thread): flags + FASTA emission.

    Yields (name, polished bytes) in order.  `batch` may be a region source
    (anything with .fetch / .header, e.g. io.bamregion.IndexedBam): each
    contig's reads are then fetched on demand, so peak RAM is one contig,
    not the whole BAM."""
    from concurrent.futures import ThreadPoolExecutor

    import jax

    from ..ops.tropical import start_host_copy

    streaming = hasattr(batch, "fetch")
    shared_levels = None if streaming else pl.filter_sgs_chain(batch)
    # contig-level device parallelism: round-robin contigs over every
    # local chip (the reference farms contig blocks across jobs,
    # source/nextPolish:93-117; here the chips are the blocks).  On CPU
    # the virtual devices share cores — single-device unless forced
    # (NPT_MULTIDEV=1, used by the multi-device equality test).
    import os as _os

    devices = jax.devices()
    if jax.default_backend() == "cpu" and \
            _os.environ.get("NPT_MULTIDEV") != "1":
        devices = devices[:1]
    n_prep = [0]

    from ..runtime import trace

    def prep(name, seq):
        with trace.timed("task1.host"):
            if streaming:
                tid = batch.header.name2id(name)
                cbatch = batch.fetch(tid, 0, max(len(seq) - 1, 0))
                clevels = pl.filter_sgs_chain(cbatch)
            else:
                cbatch, clevels = batch, shared_levels
            dev = devices[n_prep[0] % len(devices)] if len(devices) > 1 \
                else None
            n_prep[0] += 1
            return score_chain_contig_begin(name, seq, cbatch, cfg,
                                            levels=clevels, device=dev)

    from collections import deque

    # two prep workers: finish-side host work is now tiny, so the main
    # thread mostly waits — a second walker keeps both cores busy (the
    # native walker releases the GIL)
    with ThreadPoolExecutor(max_workers=2) as pool:
        it = iter(names_seqs)
        # two preps in flight on in-memory batches; a streaming source
        # (IndexedBam) shares one file handle + block cache, so its
        # fetches must not run concurrently
        prep_depth = 1 if streaming else 2
        futq: deque = deque()
        for nxt in it:
            futq.append((nxt[0], pool.submit(prep, *nxt)))
            if len(futq) >= prep_depth:
                break
        pending: deque = deque()  # (name, handle) with DP in flight
        while futq:
            name, fut = futq.popleft()
            h = fut.result()  # prep of this contig (DP now dispatched)
            start_host_copy(h[3])
            nxt = next(it, None)
            if nxt is not None:
                futq.append((nxt[0], pool.submit(prep, *nxt)))
            pending.append((name, h))
            # results are fetched several contigs behind their dispatch,
            # giving the device scan + host copy a few full prep slots
            # (~50 ms each) to stream back before anyone blocks on them;
            # with several chips the window deepens so every chip holds
            # a contig
            if len(pending) > max(4, 2 * len(devices)):
                pname, ph = pending.popleft()
                yield pname, score_chain_contig_end(ph)
        while pending:
            pname, ph = pending.popleft()
            yield pname, score_chain_contig_end(ph)


def td_score_chain_contig(name: str, draft: bytes, batch: AlnBatch,
                          cfg: AlgoConfig) -> bytes:
    """Legacy long-read chain variant (td_score_chain1, lib/scorechain.c:17-29):
    lgs filter, lgs balance factor, no lowercase flags in output."""
    tid = batch.header.name2id(name)
    L = len(draft)
    levels = pl.filter_lgs(batch, cfg.max_clip_ratio_lgs)
    index = pl.build_cell_index(batch, levels, tid, 0, L - 1)
    state = ContigState.from_draft(name, draft, index)
    contig_nib = ASCII_TO_NIB[np.frombuffer(draft, dtype=np.uint8)]
    score_correct_region(state, batch, levels, tid, contig_nib, 0, L - 1,
                         filterlevel=1, rate=cfg.indel_balance_factor_lgs,
                         cfg=cfg)
    maybe_trace(cfg, name, state, draft)
    return state.emit(0)
