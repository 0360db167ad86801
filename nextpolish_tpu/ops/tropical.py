"""Score-chain DP as a blocked tropical ((max,+)) matrix scan on TPU.

The reference computes a sequential per-cell Viterbi over observed 3-mers
(contig_calculate_score / contig_region_score / contig_region_correct,
lib/contig.c:424-496): state = last emitted base (16 nibbles there, 8 compact
symbols here), transition value = adjusted 3-mer count, prefix-base-0 kmers
chain from the running max (base_max_score), and the backtrack follows stored
kmer prefixes.

TPU-native reformulation
------------------------
Each cell's transition is an 8x8 tropical matrix

    M_c[b2, b3] = max_b1  count'_c(b1,b2,b3) - total'_c * rate   (or -inf)

augmented with a pseudo-state 0 that carries the running max:
A[:,0] = rowmax(M) keeps s[0] == max over real states, and row A[0,:] feeds
read-start kmers from that max — exactly base_max_score semantics.  The whole
chain is then an associative product of A matrices:

  * phase 1: per-chunk composed products (vmapped scans — parallel over chunks)
  * phase 2: `lax.associative_scan` over chunk products (log depth)
  * phase 3: per-chunk state replay (vmapped) -> forward vector f at every cell

Exact traceback with the reference's tie order
----------------------------------------------
The C resolves score ties by SeqList insertion order: `base_add_score`
replaces an entry only on strictly-greater score, and `base_max_score` keeps
the FIRST maximum in score-list order (lib/base.c:159-199).  Both orders
reduce to the per-cell *first-observation rank* of each kmer (contig-as-read
first, then reads in BAM order).  Scores themselves are tie-independent, so:

  * the forward values f come from the tropical scan as before;
  * a per-cell 8-entry pointer table P[c, b] (predecessor base given base b
    at cell c) is built elementwise from (em, rank, f[c-1]), selecting the
    min-rank kmer among per-(cell,base) score winners and resolving
    base_max_score ties by min insertion rank;
  * the backtrack b_{c-1} = P[c, b_c] is an iterated composition of
    {0..7}->{0..7} maps — associative — run as a second tropical scan over
    0/NEG relation matrices.

Scores are kept in f32 with per-step renormalization (uniform per-cell shifts
never change any argmax in a tropical chain).  Exactness condition: with a
DYADIC rate (k/2^m, small m — the sgs default 0.5, or 0.25/0.375/...), every
score is an exact multiple of 2^-m and the renormalized magnitudes stay far
inside 2^24, so every f32 comparison is EXACT and tie sites match the
reference byte-for-byte (property-tested vs the f64 oracle,
test_f32_tie_exactness_on_and_off_grid).  An off-grid rate (the lgs default
0.33) rounds in f32 — as the reference's own f64 rounds it, just at a
different bit — so divergence vs an f64 oracle is possible but confined to
true-tie sites (the same test bounds it).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .symbols import K3, S

# a numpy scalar, NOT jnp: creating a jax value at import time would
# initialize the XLA backend before jax.distributed.initialize can run
NEG = np.float32(-1e9)
CHUNK = 128
RANK_BIG = np.int32(1 << 20)  # > any real first-observation rank (< 512)


def tropical_compose(a, b):
    """(max,+) matrix product over the last two axes."""
    return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def _eye():
    return jnp.full((S, S), NEG).at[jnp.arange(S), jnp.arange(S)].set(0.0)


def emission(counts, refkmer, total, rate):
    """Per-cell per-kmer emission scores em[L, K3] (NEG where unobserved).

    Mirrors contig_calculate_score's adjustments (lib/contig.c:424-453):
    candidates are observed kmers only; the draft's own kmer is decremented
    when the cell has real coverage; the per-cell normalizer uses total-1
    when total > 1.
    """
    cnt = counts.astype(jnp.float32)
    valid = counts > 0
    dec = (total > 1).astype(jnp.float32)
    L = counts.shape[0]
    adj = cnt.at[jnp.arange(L), refkmer].add(-dec)
    tot1 = jnp.where(total > 1, total - 1, total).astype(jnp.float32)
    return jnp.where(valid, adj - tot1[:, None] * jnp.float32(rate), NEG)


def build_transition(em):
    """Augmented transition matrices A[L, S, S] from emission scores."""
    em3 = em.reshape(-1, S, S, S)
    M = jnp.max(em3, axis=1)  # max over b1 -> [L, b2, b3]
    rowmax = jnp.max(M, axis=2)
    return M.at[:, :, 0].set(rowmax)


def _forward_states(A, s0, chunk):
    """All-prefix state vectors: f[t] = s0 (x) A_0 (x) ... (x) A_t.

    A may have leading batch axes [..., L, S, S]; s0 broadcasts [..., S].
    Batched directions/windows share the same sequential scan steps.
    """
    *batch, L, _, _ = A.shape
    nch = L // chunk
    Ach = A.reshape(*batch, nch, chunk, S, S)
    Ach = jnp.moveaxis(Ach, -3, 0)  # [chunk, *batch, nch, S, S]

    def comp_step(carry, a):
        out = tropical_compose(carry, a)
        out = out - jnp.max(out, axis=(-2, -1), keepdims=True)
        return out, None

    eye = jnp.broadcast_to(_eye(), (*batch, nch, S, S))
    P, _ = jax.lax.scan(comp_step, eye, Ach)  # [*batch, nch, S, S]
    Pinc = jax.lax.associative_scan(tropical_compose, P, axis=-3)
    Pexc = jnp.concatenate([eye[..., :1, :, :], Pinc[..., :-1, :, :]],
                           axis=-3)
    s_start = jnp.max(s0[..., None, :, None] + Pexc, axis=-2)
    s_start = s_start - jnp.max(s_start, axis=-1, keepdims=True)

    def apply_step(s, a):
        out = jnp.max(s[..., :, None] + a, axis=-2)
        return out, out

    _, fs = jax.lax.scan(apply_step, s_start, Ach)  # [chunk, *batch, nch, S]
    f = jnp.moveaxis(fs, 0, -2)  # [*batch, nch, chunk, S]
    return f.reshape(*batch, L, S)


# 6-bit kmer prefix index -> its b2 state (prefix base 0 chains from the
# running max, which _forward_states keeps in state 0)
def _pointers(em, rank, fprev, valid):
    """Per-cell predecessor table + base_max_score selection.

    Returns (P[L, S] int32 — predecessor base at cell c-1 given base b at
    cell c; msel[L] int32 — base_max_score's pick at each cell, ties by min
    score-list insertion rank = min first-observation rank per base).
    """
    L = em.shape[0]
    emr = em.reshape(L, S * S, S)
    obsr = emr > NEG * 0.5
    pref_b2 = jnp.arange(S * S, dtype=jnp.int32) % S
    gath = fprev[:, pref_b2]  # [L, 64]; fprev[:, 0] is the running max
    sc = jnp.where(obsr, gath[:, :, None] + emr, NEG)
    V = jnp.max(sc, axis=1)  # [L, S] per-base best score
    rkr = jnp.where(obsr, rank.reshape(L, S * S, S).astype(jnp.int32),
                    RANK_BIG)
    # winning kmer per (cell, base): strictly-greater replacement in data
    # order keeps the min-rank kmer among score winners (base_add_score)
    winner = (sc == V[:, None, :]) & obsr
    wp = jnp.argmin(jnp.where(winner, rkr, RANK_BIG), axis=1)  # prefix idx
    wb2 = (wp % S).astype(jnp.int32)
    Rm = jnp.min(rkr, axis=1)  # [L, S] score-list insertion rank per base
    lane_obs = jnp.any(obsr, axis=1)
    # base_max_score: first maximum in insertion order (lib/base.c:185-197)
    Vmax = jnp.max(jnp.where(lane_obs, V, NEG), axis=1)
    cand = (V == Vmax[:, None]) & lane_obs
    msel = jnp.argmin(jnp.where(cand, Rm, RANK_BIG), axis=1).astype(jnp.int32)
    msel_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), msel[:-1]])
    P = jnp.where(wb2 != 0, wb2, msel_prev[:, None])
    iota = jnp.arange(S, dtype=jnp.int32)
    P = jnp.where(valid[:, None], P, iota[None, :])
    return P, msel


def _traceback(P, b_end, chunk):
    """b_{c-1} = P[c, b_c] as a reverse scan of map compositions.

    Maps {0..7}->{0..7} compose associatively; encoded as 0/NEG relation
    matrices they compose under the same tropical product as the forward
    scan, so the machinery is shared.
    """
    L = P.shape[0]
    onehot = jax.nn.one_hot(P, S, dtype=jnp.float32)  # [L, S, S]
    Mt = jnp.where(onehot > 0, jnp.float32(0.0), NEG)
    Mrev = jnp.concatenate([jnp.flip(Mt[1:], axis=0), _eye()[None]], axis=0)
    u = jnp.where(jnp.arange(S) == b_end, jnp.float32(0.0), NEG)
    frev = _forward_states(Mrev, u, chunk)  # [L, S]; row c -> base at L-2-c
    bvals = jnp.argmax(frev, axis=1).astype(jnp.int8)
    return jnp.concatenate(
        [jnp.flip(bvals[: L - 1]), b_end.astype(jnp.int8)[None]])


def _traceback_batch(P, b_end, chunk):
    """_traceback with a leading contig axis: P [B, L, S], b_end [B].
    Each contig's reverse map-composition scan is independent, so the
    batch is bit-identical to per-contig _traceback calls."""
    B, L, _ = P.shape
    onehot = jax.nn.one_hot(P, S, dtype=jnp.float32)
    Mt = jnp.where(onehot > 0, jnp.float32(0.0), NEG)
    eye = jnp.broadcast_to(_eye()[None, None], (B, 1, S, S))
    Mrev = jnp.concatenate([jnp.flip(Mt[:, 1:], axis=1), eye], axis=1)
    u = jnp.where(jnp.arange(S)[None, :] == b_end[:, None],
                  jnp.float32(0.0), NEG)
    frev = _forward_states(Mrev, u, chunk)  # [B, L, S]
    bvals = jnp.argmax(frev, axis=2).astype(jnp.int8)
    return jnp.concatenate(
        [jnp.flip(bvals[:, : L - 1], axis=1),
         b_end.astype(jnp.int8)[:, None]], axis=1)


def _chain_core(counts, rank, refkmer, total, valid, rate, s0, chunk):
    em = emission(counts, refkmer, total, rate)
    A = build_transition(em)
    A = jnp.where(valid[:, None, None], A, _eye()[None])
    s0 = s0.astype(jnp.float32)
    f = _forward_states(A, s0, chunk)  # [L, S]
    fprev = jnp.concatenate([s0[None], f[:-1]], axis=0)
    P, msel = _pointers(em, rank, fprev, valid)
    lastidx = jnp.maximum(jnp.sum(valid.astype(jnp.int32)) - 1, 0)
    b_end = msel[lastidx]
    choice = _traceback(P, b_end, chunk)
    return choice, jnp.max(f, axis=1)


@partial(jax.jit, static_argnames=("chunk",))
def chain_correct(counts, rank, refkmer, total, valid, rate, s0, chunk=CHUNK):
    """Run the full chain DP with exact reference tie-breaking.

    Args:
      counts: [L, 512] int pileup (L padded to a multiple of `chunk`).
      rank:   [L, 512] uint16 per-cell first-observation rank (0xFFFF where
              unobserved; see ops/pileup.py event_ranks).
      refkmer: [L] int32 draft 3-mer per cell.
      total:  [L] int32 cell totals.
      valid:  [L] bool — False cells get identity transitions (padding).
      rate:   indel balance factor (score normalizer).
      s0:     [S] initial state scores — 0 for prefix bases observed at the
              region's first cell (the reference's `temp` seed cell,
              lib/contig.c:456-464), NEG elsewhere.

    Returns (choice[L] int8 compact symbol, best[L] f32 running best score).
    """
    return _chain_core(counts, rank, refkmer, total, valid, rate, s0, chunk)


FLAGB_ZERO = 3   # bit of FLAG_ZERO (total == 1) in the packed result byte
FLAGB_COV = 4    # bit of FLAG_COVERAGE (low chosen-base support)


@partial(jax.jit, static_argnames=("L", "E", "TH", "chunk"))
def chain_correct_packed(buf, L, E, TH, chunk=CHUNK):
    """chain_correct with every input packed into ONE uint16 buffer —
    the host<->device link (a tunnel here) has high per-transfer latency
    and ~tens-of-MB/s bandwidth, so the encoding is as tight as exactness
    allows.  Keys ride as deltas: every DP cell observes at least its own
    draft kmer, so consecutive sorted keys differ by < 2*K3 and fit u16
    (a device cumsum reconstructs them).

    Layout (u16 lanes): [duk(E) | cn(E) | rk(E) | refkmer(L) | total(L) |
    s0mask, rate_lo, rate_hi, n_dp_lo, n_dp_hi | th(2*TH as lo/hi pairs)].

    th is the host-built integer coverage-threshold LUT indexed by
    min(total, TH-1): cell is FLAG_COVERAGE iff cov < th[total], where the
    host computed th with the exact f64 arithmetic of the reference's
    `count / (double)total < ratio` decision (base_get_coverage,
    lib/base.c:79-89 + lib/contig.c:487) — so the flag computed on device
    in pure integers is bit-identical to the host/f64 result.

    Returns packed[L] int8: choice | FLAG_ZERO bit 3 | FLAG_COVERAGE bit 4.
    One byte per cell is all that ever crosses back over the link."""
    b32 = buf.astype(jnp.int32)
    tail = 3 * E + 2 * L
    s0mask = b32[tail]
    rate = jax.lax.bitcast_convert_type(
        (b32[tail + 1] | (b32[tail + 2] << 16)).astype(jnp.int32),
        jnp.float32)
    n_dp = b32[tail + 3] | (b32[tail + 4] << 16)
    nnz = b32[tail + 5] | (b32[tail + 6] << 16)
    th = (b32[tail + 7:tail + 7 + 2 * TH:2]
          | (b32[tail + 8:tail + 8 + 2 * TH:2] << 16))
    # duk[0] = first key (< K3: cell 0 holds its draft kmer); pad lanes
    # carry delta 0 and are redirected to the trash slot below
    uk = jnp.cumsum(b32[:E])
    uk = jnp.where(jnp.arange(E) < nnz, uk, L * K3)
    cn = buf[E:2 * E]
    rk = buf[2 * E:3 * E]
    rkm = b32[3 * E:3 * E + L]
    total = b32[3 * E + L:3 * E + 2 * L]
    valid = jnp.arange(L, dtype=jnp.int32) < n_dp
    s0 = jnp.where((s0mask >> jnp.arange(S)) & 1 != 0, jnp.float32(0.0), NEG)
    P, msel, cov2 = _chain_entries_core(
        uk, cn, rk, rkm, total, valid, rate, s0[None, :], 1, L, chunk)
    lastidx = jnp.maximum(n_dp - 1, 0)
    choice = _traceback(P, msel[lastidx], chunk)
    cov = jnp.take_along_axis(cov2, choice.astype(jnp.int32)[:, None],
                              axis=1)[:, 0]
    zero = (total == 1).astype(jnp.int8) << FLAGB_ZERO
    low = (cov < th[jnp.minimum(total, TH - 1)]).astype(jnp.int8) << FLAGB_COV
    return choice | zero | low


def _chain_entries_core(uk, cn, rk, refkmer, total, valid, rate, s0_all,
                        B, L, chunk):
    """Chain DP in SPARSE ENTRY SPACE — the device half of the packed
    paths.  A pileup cell observes ~2-4 of its 512 possible kmers, so
    the dense [L, 512] emission/score tensors are >99% NEG padding; the
    per-kmer work (emission adjustments, per-(cell, suffix) best-score
    and tie-rank selection) runs as segment max/min reductions over the
    E real entries instead, and only the [L, S, S] transition lattice
    and [L, S] pointer tables materialize.  Measured ~7x faster than
    the dense formulation on a 131k-cell contig, bit-identical results.

    B contigs of L cells each batch as a LEADING SCAN AXIS: segment
    reductions run flat over the B*L global cell space (numerically
    independent per cell), and the sequential forward scan runs with
    batch dims so every contig's state trajectory is bit-identical to
    its single-contig run (a concatenated-chain formulation with reset
    matrices is only shift-invariant in exact arithmetic — f32 rounding
    of shifted scores flips ties).

    Returns (P [B*L, S] predecessor table, msel [B*L] base_max_score
    picks, cov2 [B*L, S] per-suffix coverage sums)."""
    Ltot = B * L
    e_cell = uk // K3
    e_kmer = uk % K3
    e_b2 = (e_kmer >> 3) & 7
    e_b3 = e_kmer & 7
    is_pad = e_cell >= Ltot
    c_cl = jnp.minimum(e_cell, Ltot - 1)
    tot_e = total[c_cl]
    # emission (lib/contig.c:424-453 adjustments, as in emission()):
    # the draft's own kmer is decremented when the cell has coverage;
    # the normalizer uses total-1 when total > 1
    dec_e = ((tot_e > 1) & (e_kmer == refkmer[c_cl])).astype(jnp.float32)
    tot1_e = jnp.where(tot_e > 1, tot_e - 1, tot_e).astype(jnp.float32)
    em_e = jnp.where(is_pad, NEG,
                     cn.astype(jnp.float32) - dec_e - tot1_e * rate)
    # transition lattice via segment max over (cell, b2, b3)
    segA = jnp.where(is_pad, Ltot * 64, c_cl * 64 + e_b2 * 8 + e_b3)
    A = jnp.full((Ltot * 64 + 1,), NEG).at[segA].max(
        em_e)[: Ltot * 64].reshape(Ltot, S, S)
    rowmax = jnp.max(A, axis=2)
    A = A.at[:, :, 0].set(rowmax)
    A = jnp.where(valid[:, None, None], A, _eye()[None])
    f = _forward_states(A.reshape(B, L, S, S), s0_all, chunk)  # [B, L, S]
    fprev = jnp.concatenate([s0_all[:, None, :], f[:, :-1]],
                            axis=1).reshape(Ltot, S)
    # per-entry chain scores; winners per (cell, suffix) with the exact
    # min-insertion-rank tie rule (base_add_score / base_max_score,
    # lib/base.c:159-197)
    sc_e = jnp.where(is_pad, NEG, fprev[c_cl, e_b2] + em_e)
    seg3 = jnp.where(is_pad, Ltot * 8, c_cl * 8 + e_b3)
    V = jnp.full((Ltot * 8 + 1,), NEG).at[seg3].max(sc_e)
    obs = jnp.zeros((Ltot * 8 + 1,), jnp.int32).at[seg3].max(
        (~is_pad).astype(jnp.int32)) > 0
    elig = (~is_pad) & (sc_e == V[seg3])
    rk32 = rk.astype(jnp.int32)
    wkey = jnp.where(elig, rk32 * 8 + e_b2, RANK_BIG)
    Wk = jnp.full((Ltot * 8 + 1,), RANK_BIG).at[seg3].min(wkey)
    Rm = jnp.full((Ltot * 8 + 1,), RANK_BIG).at[seg3].min(
        jnp.where(is_pad, RANK_BIG, rk32))
    cov3 = jnp.zeros((Ltot * 8 + 1,), jnp.int32).at[seg3].add(
        jnp.where(is_pad, 0, cn.astype(jnp.int32)))
    V2 = V[: Ltot * 8].reshape(Ltot, S)
    obs2 = obs[: Ltot * 8].reshape(Ltot, S)
    wb2 = jnp.where(obs2, Wk[: Ltot * 8].reshape(Ltot, S) & 7, 0)
    Rm2 = Rm[: Ltot * 8].reshape(Ltot, S)
    Vmax = jnp.max(jnp.where(obs2, V2, NEG), axis=1)
    cand = (V2 == Vmax[:, None]) & obs2
    msel = jnp.argmin(jnp.where(cand, Rm2, RANK_BIG),
                      axis=1).astype(jnp.int32)
    msel_prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         msel.reshape(B, L)[:, :-1]], axis=1).reshape(Ltot)
    P = jnp.where(wb2 != 0, wb2.astype(jnp.int32), msel_prev[:, None])
    P = jnp.where(valid[:, None], P, jnp.arange(S, dtype=jnp.int32)[None])
    return P, msel, cov3[: Ltot * 8].reshape(Ltot, S)


@partial(jax.jit, static_argnames=("L", "E", "TH", "chunk"))
def chain_correct_packed_batch(bufs, L, E, TH, chunk=CHUNK):
    """Batched chain_correct_packed: bufs [B, buflen], one CONTIG per
    row (same L/E/TH bucket).  This is the contig axis the reference
    parallelises with worker processes (lib/nextpolish1.py:223-224),
    packed into the LANE dimension of the blocked scan: the B contigs
    concatenate into one virtual [B*L] cell chain, so the launch runs
    the same ~L/chunk+2*chunk sequential steps as ONE contig — the scan
    is latency-bound and the extra lanes ride along almost free.  (A
    vmap formulation instead serializes the big scatters and triples the
    wall; measured 5x slower.)

    Contig boundaries are handled exactly by keeping each contig on its
    OWN row of a leading scan axis (no cross-row state ever mixes):
      * the forward scan runs with batch dims — row b starts from its
        own s0 (derived from its s0mask), so every state trajectory is
        bit-identical to that contig's single-row run (a concatenated
        chain with rank-1 reset matrices is only shift-invariant in
        exact arithmetic; f32 rounding of shifted scores flips ties —
        see _chain_entries_core);
      * the pointer pass sees fprev = s0 and msel_prev = 0 at each
        row's first cell (per-row reset of the running-max chain);
      * the traceback runs per row (_traceback_batch) seeded from
        msel[last valid cell of that row] (lib/contig.c:473-496 per
        region).
    """
    b32 = bufs.astype(jnp.int32)  # [B, buflen]
    B = b32.shape[0]
    tail = 3 * E + 2 * L
    s0mask = b32[:, tail]
    rate = jax.lax.bitcast_convert_type(
        (b32[0, tail + 1] | (b32[0, tail + 2] << 16)).astype(jnp.int32),
        jnp.float32)
    n_dp = b32[:, tail + 3] | (b32[:, tail + 4] << 16)  # [B]
    nnz = b32[:, tail + 5] | (b32[:, tail + 6] << 16)
    # th LUTs are identical across rows (same cov_ratio, same TH bucket)
    th = (b32[0, tail + 7:tail + 7 + 2 * TH:2]
          | (b32[0, tail + 8:tail + 8 + 2 * TH:2] << 16))
    uk = jnp.cumsum(b32[:, :E], axis=1)
    lanes_e = jnp.arange(E)[None, :]
    trash = B * L * K3
    uk_g = jnp.where(lanes_e < nnz[:, None],
                     uk + (jnp.arange(B) * (L * K3))[:, None], trash)
    cn = bufs[:, E:2 * E]
    rk = bufs[:, 2 * E:3 * E]
    refkmer = b32[:, 3 * E:3 * E + L].reshape(B * L)
    total = b32[:, 3 * E + L:3 * E + 2 * L].reshape(B * L)
    valid = (jnp.arange(L)[None, :] < n_dp[:, None]).reshape(B * L)
    s0_all = jnp.where((s0mask[:, None] >> jnp.arange(S)[None, :]) & 1 != 0,
                       jnp.float32(0.0), NEG)  # [B, S]
    P, msel, cov2 = _chain_entries_core(
        uk_g.ravel(), cn.ravel(), rk.ravel(), refkmer, total, valid, rate,
        s0_all, B, L, chunk)
    starts = jnp.arange(B, dtype=jnp.int32) * L
    lastidx = starts + jnp.maximum(n_dp - 1, 0)
    b_ends = msel[lastidx]  # [B]
    choice = _traceback_batch(P.reshape(B, L, S), b_ends,
                              chunk).reshape(B * L)
    cov = jnp.take_along_axis(cov2, choice.astype(jnp.int32)[:, None],
                              axis=1)[:, 0]
    zero = (total == 1).astype(jnp.int8) << FLAGB_ZERO
    low = (cov < th[jnp.minimum(total, TH - 1)]).astype(jnp.int8) << FLAGB_COV
    return (choice | zero | low).reshape(B, L)


# ---------------------------------------------------------------------------
# per-cell SLOT-PLANE formulation — the production packed path.
#
# Stage bisection of the entry-space launch (tools/profile_chain.py, TPU
# v5e: decode 0.2 / emission gathers 7.8 / A-build scatter 10.2 / forward
# scan 0.4 / pointer segment passes 13.5 / traceback+flags 4.3 ms) shows
# ~31 of 36 ms in gather/scatter over the E entry space, NOT in the
# sequential scans.  A pileup cell observes few distinct kmers and the
# first-observation rank IS a dense per-cell slot index, so the entries
# lay out as [Emax, L] kmer/count planes (slot j of cell c at plane j) —
# every former segment reduction becomes a masked reduction over the
# tiny slot axis that XLA fuses, with zero big scatters.  Cells with
# more than Emax distinct kmers spill to a small overflow entry list
# processed by the old segment-scatter path and merged exactly (max/min/
# sum are order-free; ties compare identical f32 values).  Plane-major
# layout also compresses well on the tunneled host<->device link (plane
# 0 = draft kmers, high planes mostly zero).
# ---------------------------------------------------------------------------


CNT_CAP = 127    # upper-plane count cap (7 bits of the kmer<<7|count word)
C0_CAP = 255     # slot-0 count cap (its own u8 plane)
TOT_MARK = 255   # u8 total-plane clamp marker; true value rides the escape


def pack_chain_planes(uk_in, cn_in, rk_in, refkmer, total, n_dp, rate,
                      cov_ratio: float = 0.8, chunk: int = CHUNK):
    """Host packing for chain_correct_planes from sorted sparse entries
    (the numpy fallback path and generic callers; the task-1 hot path
    gets the same parts straight from the native slot walker and calls
    pack_chain_planes_parts).  See pack_chain_planes_parts for the
    buffer layout and diversion rules."""
    n_dp = max(n_dp, 0)
    hi = int(np.searchsorted(uk_in, n_dp * K3))
    cells = (uk_in[:hi] // K3).astype(np.int64)
    kmers = (uk_in[:hi] % K3).astype(np.int64)
    cnc = np.minimum(cn_in[:hi], 0xFFFF).astype(np.int64)
    rkc = np.asarray(rk_in[:hi], dtype=np.int64)
    refk = np.asarray(refkmer[:n_dp], dtype=np.int64)
    is0 = rkc == 0
    divert = ((~is0 & (cnc > CNT_CAP)) | (is0 & (cnc > C0_CAP))
              | (is0 & (kmers != refk[cells])) | (rkc >= 8))
    upper = np.zeros((7, max(n_dp, 1)), dtype=np.uint16)
    c0 = np.zeros(max(n_dp, 1), dtype=np.uint8)
    keep = ~divert
    k0m = keep & is0
    c0[cells[k0m]] = cnc[k0m]
    kum = keep & ~is0
    upper.reshape(-1)[(rkc[kum] - 1) * max(n_dp, 1) + cells[kum]] = \
        (kmers[kum] << 7) | cnc[kum]
    stats = np.zeros(16, dtype=np.int32)
    if hi:
        hcnt = np.bincount(rkc[keep], minlength=9)[:9]
        stats[:9] = hcnt.astype(np.int32)
        kc0 = kmers[cells == 0]
        if len(kc0):
            stats[9] = int(np.bitwise_or.reduce(1 << ((kc0 >> 3) & 7)))
    ov = (cells[divert] * K3 + kmers[divert], cnc[divert], rkc[divert])
    return pack_chain_planes_parts(upper, c0, total, stats, ov, refkmer,
                                   n_dp, rate, cov_ratio, chunk)


def pack_chain_planes_parts(upper, c0, totals, stats, ov, refkmer, n_dp,
                            rate, cov_ratio: float = 0.8,
                            chunk: int = CHUNK):
    """Assemble the chain_correct_planes transfer buffer, ONE u16 array,
    as tight as exactness allows (the tunnel wire is the bottleneck on
    this rig — throughput is ~1/bytes):

      [sym4(L/4)  — 4-bit draft symbols, 4 per u16 (FMT 0), or
       refk(L)    — full u16 refkmer row (FMT 1, arbitrary refkmer)
      | c0(L/2)   — slot-0 counts as u8 pairs (contig-as-read kmer
                    counts; the kmer itself is the refkmer)
      | p1 dense u16 plane: kmer<<7 | count (rank 1)
      | per rank j in [2, Emax): bitmap(L/16) + packed(P_j) u16 words
        (upper planes are 3-25% occupied — bitmap + packed words cost
        occupancy-proportional wire instead of 2 B/cell; the device
        re-densifies with a cumsum + gather)
      | tot(L/2)  — totals as u8 pairs, 255 = clamp marker
      | tesc(4*ET)— escaped totals: cell u32 + value u32 as lo/hi pairs
      | ovk_lo/hi, ovcn, ovrk (4*EOV) — overflow entries
      | s0mask, rate, n_dp, nov, net (9 u16) | th(2*TH lo/hi pairs)]

    FMT 0 reconstructs refkmer on device from the rolling 3-mer of the
    4-bit symbol stream (rolling_kmers semantics, PAD=0 beyond the left
    edge) — the draft row costs 0.5 bytes/cell instead of 2; the pack
    falls back to FMT 1 when the given refkmer is not a rolling stream
    (synthetic inputs).  Inputs are the walker-shaped parts (the native
    slot walker emits them directly, native.pileup_planes): upper [7,
    n_dp] u16 rank-1..7 planes with caps already applied, c0 [n_dp] u8
    slot-0 counts, stats[0:9] = kept-entry histogram by rank + stats[9]
    = cell-0 prefix mask, ov = cap/mismatch/spill overflow entry arrays
    sorted by key.  A diverted entry's dense slot is empty (unobserved),
    so the slot-index-is-rank invariant holds for whatever stays dense.
    Emax minimizes wire bytes + a 4x overflow-byte penalty (overflow
    also costs host pack and device scatter time) over {2,3,4,6,8};
    planes at rank >= Emax move to the overflow list.  Returns
    (buf, L, Emax, EOV, ET, FMT, TH, PS) with PS = the packed-word
    bucket per sparse plane; EOV == ET == 0 in the common case — the
    launch then contains no scatter at all."""
    L = pad_to_chunk(max(n_dp, 1), chunk)
    refk = np.asarray(refkmer[:n_dp], dtype=np.int64)
    roll_ok = bool(n_dp) and int(refk[0]) == int(refk[0] & 7) and bool(
        np.all(refk[1:] == (((refk[:-1] & 63) << 3) | (refk[1:] & 7))))
    FMT = 0 if roll_ok else 1
    ovk, ovc, ovr = (np.asarray(a, dtype=np.int64) for a in ov)
    hist = np.asarray(stats[:9], dtype=np.int64)
    best = None
    for em in (2, 3, 4, 6, 8):
        nov = int(hist[em:8].sum()) + len(ovk)
        eov = 0 if nov == 0 else _pow2(max(nov, 512))
        cost = (2 * min(em - 1, 1) * L
                + sum(L // 8 + 2 * _pow2(max(int(hist[j]), 64))
                      for j in range(2, em))
                + 4 * 8 * eov)
        if best is None or cost < best[0]:
            best = (cost, em, eov, nov)
    _, Emax, EOV, nov = best
    PS = tuple(_pow2(max(int(hist[j]), 64)) for j in range(2, Emax))
    nd1 = max(n_dp, 1)
    if Emax < 8:
        left = upper[Emax - 1:]
        nz = np.flatnonzero(left)
        if len(nz):
            w = left.reshape(-1)[nz].astype(np.int64)
            lk = (nz % nd1) * K3 + (w >> 7)
            ovk = np.concatenate([ovk, lk])
            ovc = np.concatenate([ovc, w & CNT_CAP])
            ovr = np.concatenate([ovr, nz // nd1 + Emax])
            order = np.argsort(ovk, kind="stable")
            ovk, ovc, ovr = ovk[order], ovc[order], ovr[order]
    assert len(ovk) == nov
    tclamp = np.minimum(totals[:n_dp], 0xFFFF).astype(np.int64)
    esc = np.flatnonzero(tclamp > TOT_MARK)
    net = len(esc)
    ET = 0 if net == 0 else _pow2(max(net, 64))
    maxt = int(tclamp.max()) if n_dp else 1
    TH = _pow2(min(maxt + 1, TH_CAP))
    s0mask = 1 | int(stats[9])
    head = (L // 4) if FMT == 0 else L
    buf = np.zeros(head + L // 2 + min(Emax - 1, 1) * L
                   + sum(L // 16 + pj for pj in PS) + L // 2 + 4 * ET
                   + 5 * EOV + 9 + 2 * TH, dtype=np.uint16)
    if FMT == 0:
        sym = np.zeros(L, dtype=np.uint16)
        sym[:n_dp] = refk & 7
        buf[: L // 4] = (sym[0::4] | (sym[1::4] << 4) | (sym[2::4] << 8)
                         | (sym[3::4] << 12))
    else:
        buf[:n_dp] = refk.astype(np.uint16)
    o = head
    buf[o: o + L // 2].view(np.uint8)[:n_dp] = c0[:n_dp]
    o += L // 2
    if Emax > 1:
        buf[o: o + L][:n_dp] = upper[0, :n_dp]
        o += L
    for pi, pj in enumerate(PS):
        plane = np.zeros(L, dtype=np.uint16)
        plane[:n_dp] = upper[pi + 1, :n_dp]
        nzp = np.flatnonzero(plane)
        assert len(nzp) <= pj
        bits = np.packbits(plane.astype(bool), bitorder="little")
        buf[o: o + L // 16].view(np.uint8)[: L // 8] = bits
        o += L // 16
        buf[o: o + len(nzp)] = plane[nzp]
        o += pj
    buf[o: o + L // 2].view(np.uint8)[:n_dp] = \
        np.minimum(tclamp, TOT_MARK).astype(np.uint8)
    o += L // 2
    if ET:
        buf[o: o + net] = esc & 0xFFFF
        buf[o + ET: o + ET + net] = esc >> 16
        buf[o + 2 * ET: o + 2 * ET + net] = tclamp[esc] & 0xFFFF
        buf[o + 3 * ET: o + 3 * ET + net] = tclamp[esc] >> 16
        # pad escape cells redirect past the cell space
        buf[o + net: o + ET] = 0xFFFF
        buf[o + ET + net: o + 2 * ET] = 0xFFFF
        o += 4 * ET
    if EOV:
        # cell and kmer ride separately: a combined cell*K3+kmer key
        # overflows int32 at L = 2^22 cells (jax x64 is off), which a
        # 3 Mb contig reaches
        ovcell = (ovk // K3).astype(np.uint32)
        buf[o: o + nov] = ovcell & 0xFFFF
        buf[o + EOV: o + EOV + nov] = ovcell >> 16
        buf[o + 2 * EOV: o + 2 * EOV + nov] = (ovk % K3).astype(np.uint16)
        buf[o + 3 * EOV: o + 3 * EOV + nov] = ovc.astype(np.uint16)
        buf[o + 4 * EOV: o + 4 * EOV + nov] = ovr.astype(np.uint16)
        o += 5 * EOV
    buf[o] = s0mask
    r32 = np.float32(rate).view(np.uint32)
    buf[o + 1] = r32 & 0xFFFF
    buf[o + 2] = r32 >> 16
    buf[o + 3] = n_dp & 0xFFFF
    buf[o + 4] = n_dp >> 16
    buf[o + 5] = nov & 0xFFFF
    buf[o + 6] = nov >> 16
    buf[o + 7] = net & 0xFFFF
    buf[o + 8] = net >> 16
    thv = coverage_thresholds(TH - 1, cov_ratio).astype(np.uint32)
    buf[o + 9:o + 9 + 2 * TH:2] = thv & 0xFFFF
    buf[o + 10:o + 10 + 2 * TH:2] = thv >> 16
    return buf, L, Emax, EOV, ET, FMT, TH, PS


def _chain_planes_core(kpl, cpl, refk, total, valid, rate, s0_all,
                       ov, B, L, Emax, EOV, chunk):
    """Slot-plane chain DP core.  kpl/cpl [B, Emax*L] u16 (kmer / count
    planes; count 0 = empty slot), refk/total [B*L] i32, valid [B*L]
    bool, s0_all [B, S], ov = (keys, cn, rk) overflow entry arrays with
    keys already offset into the global B*L cell space (pads redirected
    past it) or None.  Returns (P [B*L, S], msel [B*L], cov2 [B*L, S])
    — bit-identical to _chain_entries_core on the same pileup (same
    formulas hence same f32 values; the max/min/int-sum reductions that
    changed shape are order-free, and ties compare identical floats)."""
    Ltot = B * L
    kd = kpl.astype(jnp.int32).reshape(B, Emax, L)
    cd = cpl.astype(jnp.int32).reshape(B, Emax, L)
    occ = cd > 0
    tot = total.reshape(B, 1, L)
    refq = refk.reshape(B, 1, L)
    dec = ((tot > 1) & (kd == refq)).astype(jnp.float32)
    tot1 = jnp.where(tot > 1, tot - 1, tot).astype(jnp.float32)
    em = jnp.where(occ, cd.astype(jnp.float32) - dec - tot1 * rate, NEG)
    b2 = (kd >> 3) & 7
    b3 = kd & 7
    # transition lattice: masked max over the slot axis (axis 1)
    hit = occ[..., None] & ((b2 * 8 + b3)[..., None]
                            == jnp.arange(64, dtype=jnp.int32))
    A = jnp.max(jnp.where(hit, em[..., None], NEG), axis=1)  # [B, L, 64]
    if ov is not None:
        e_cell, e_kmer, ovcn, ovrk = ov
        is_pad = e_cell >= Ltot
        c_cl = jnp.minimum(e_cell, Ltot - 1)
        tot_e = total[c_cl]
        dec_e = ((tot_e > 1) & (e_kmer == refk[c_cl])).astype(jnp.float32)
        tot1_e = jnp.where(tot_e > 1, tot_e - 1, tot_e).astype(jnp.float32)
        em_e = jnp.where(is_pad, NEG,
                         ovcn.astype(jnp.float32) - dec_e - tot1_e * rate)
        oe_b2 = (e_kmer >> 3) & 7
        oe_b3 = e_kmer & 7
        segA = jnp.where(is_pad, Ltot * 64, c_cl * 64 + oe_b2 * 8 + oe_b3)
        Ao = jnp.full((Ltot * 64 + 1,), NEG).at[segA].max(
            em_e)[: Ltot * 64].reshape(B, L, 64)
        A = jnp.maximum(A, Ao)
    A = A.reshape(Ltot, S, S)
    rowmax = jnp.max(A, axis=2)
    A = A.at[:, :, 0].set(rowmax)
    A = jnp.where(valid[:, None, None], A, _eye()[None])
    f = _forward_states(A.reshape(B, L, S, S), s0_all, chunk)
    fprev = jnp.concatenate([s0_all[:, None, :], f[:, :-1]],
                            axis=1)  # [B, L, S]
    # per-slot chain scores: fprev picked by b2 via exact one-hot sums
    # (one nonzero term per slot, so the sum IS the gathered value)
    oh2 = (b2[..., None] == jnp.arange(S, dtype=jnp.int32))
    fg = jnp.sum(jnp.where(oh2, fprev[:, None, :, :], 0.0), axis=3)
    sc = jnp.where(occ, fg + em, NEG)  # [B, Emax, L]
    oh3 = occ[..., None] & (b3[..., None] == jnp.arange(S, dtype=jnp.int32))
    V = jnp.max(jnp.where(oh3, sc[..., None], NEG), axis=1)  # [B, L, S]
    # the entry-space path's segment max initializes at NEG, silently
    # flooring scores whose predecessor states collapsed (possible only
    # on inputs without the contig-as-read chain invariant); replicate
    # the floor so both kernels stay bit-identical on any input
    V = jnp.maximum(V, NEG)
    obs2 = jnp.any(oh3, axis=1)
    cov2 = jnp.sum(jnp.where(oh3, cd[..., None], 0), axis=1)
    slot = jnp.arange(Emax, dtype=jnp.int32)[None, :, None, None]
    # slot index IS the per-cell first-observation rank in the planes
    Rm = jnp.min(jnp.where(oh3, slot, RANK_BIG), axis=1)
    if ov is not None:
        seg3 = jnp.where(is_pad, Ltot * 8, c_cl * 8 + oe_b3)
        fprev_f = fprev.reshape(Ltot, S)
        fg_o = jnp.sum(jnp.where(
            oe_b2[:, None] == jnp.arange(S, dtype=jnp.int32),
            fprev_f[c_cl], 0.0), axis=1)
        sc_o = jnp.where(is_pad, NEG, fg_o + em_e)
        Vo = jnp.full((Ltot * 8 + 1,), NEG).at[seg3].max(sc_o)
        obs_o = jnp.zeros((Ltot * 8 + 1,), jnp.int32).at[seg3].max(
            (~is_pad).astype(jnp.int32))
        cov_o = jnp.zeros((Ltot * 8 + 1,), jnp.int32).at[seg3].add(
            jnp.where(is_pad, 0, ovcn.astype(jnp.int32)))
        Rm_o = jnp.full((Ltot * 8 + 1,), RANK_BIG).at[seg3].min(
            jnp.where(is_pad, RANK_BIG, ovrk.astype(jnp.int32)))
        V = jnp.maximum(V, Vo[: Ltot * 8].reshape(B, L, S))
        obs2 = obs2 | (obs_o[: Ltot * 8].reshape(B, L, S) > 0)
        cov2 = cov2 + cov_o[: Ltot * 8].reshape(B, L, S)
        Rm = jnp.minimum(Rm, Rm_o[: Ltot * 8].reshape(B, L, S))
    # winners per (cell, suffix) against the MERGED V, exact min-rank
    # tie rule (base_add_score / base_max_score, lib/base.c:159-197)
    Vg = jnp.sum(jnp.where(oh3, V[:, None, :, :], 0.0), axis=3)
    wkey = jnp.where((sc == Vg)[..., None] & oh3,
                     slot * 8 + b2[..., None], RANK_BIG)
    Wk = jnp.min(wkey, axis=1)  # [B, L, S]
    if ov is not None:
        Vm_o = jnp.maximum(Vo, jnp.concatenate(
            [V.reshape(Ltot * 8), jnp.full(1, NEG)]))
        elig_o = (~is_pad) & (sc_o == Vm_o[seg3])
        wkey_o = jnp.where(elig_o, ovrk.astype(jnp.int32) * 8 + oe_b2,
                           RANK_BIG)
        Wko = jnp.full((Ltot * 8 + 1,), RANK_BIG).at[seg3].min(wkey_o)
        Wk = jnp.minimum(Wk, Wko[: Ltot * 8].reshape(B, L, S))
    V2 = V.reshape(Ltot, S)
    obs2 = obs2.reshape(Ltot, S)
    wb2 = jnp.where(obs2, Wk.reshape(Ltot, S) & 7, 0)
    Rm2 = Rm.reshape(Ltot, S)
    Vmax = jnp.max(jnp.where(obs2, V2, NEG), axis=1)
    cand = (V2 == Vmax[:, None]) & obs2
    msel = jnp.argmin(jnp.where(cand, Rm2, RANK_BIG),
                      axis=1).astype(jnp.int32)
    msel_prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         msel.reshape(B, L)[:, :-1]], axis=1).reshape(Ltot)
    P = jnp.where(wb2 != 0, wb2.astype(jnp.int32), msel_prev[:, None])
    P = jnp.where(valid[:, None], P, jnp.arange(S, dtype=jnp.int32)[None])
    return P, msel, cov2.reshape(Ltot, S)


def _unpack_u8(words):
    """[B, L/2] u16 words -> [B, L] little-endian byte lanes."""
    B, H = words.shape
    return jnp.stack([words & 0xFF, words >> 8], axis=-1).reshape(B, 2 * H)


def _planes_decode(b32, B, L, Emax, EOV, ET, FMT, TH, PS):
    """Shared buffer decode for the planes kernels; b32 [B, buflen].
    See pack_chain_planes for the layout.  Returns kpl/cpl [B, Emax*L]
    (slot kmer / count lanes, plane-major) plus the scalar rows."""
    if FMT == 0:
        w = b32[:, : L // 4]
        sym = jnp.stack([w & 15, (w >> 4) & 15, (w >> 8) & 15,
                         (w >> 12) & 15], axis=-1).reshape(B, L)
        # rolling_kmers with PAD(=0) beyond the left edge
        z1 = jnp.zeros((B, 1), sym.dtype)
        prev1 = jnp.concatenate([z1, sym[:, :-1]], axis=1)
        prev2 = jnp.concatenate([z1, z1, sym[:, :-2]], axis=1)
        refk = (prev2 << 6) | (prev1 << 3) | sym
        o = L // 4
    else:
        refk = b32[:, :L]
        o = L
    c0 = _unpack_u8(b32[:, o: o + L // 2])
    o += L // 2
    ups = []
    if Emax > 1:
        ups.append(b32[:, o: o + L])
        o += L
    for pj in PS:
        # re-densify a bitmap + packed-words plane: bit positions index
        # into the packed array via an exclusive running count
        words = b32[:, o: o + L // 16]
        o += L // 16
        packed = b32[:, o: o + pj]
        o += pj
        bits = ((words[:, :, None] >> jnp.arange(16, dtype=jnp.int32))
                & 1).reshape(B, L)
        idx = jnp.cumsum(bits, axis=1) - 1
        w = jnp.take_along_axis(packed, jnp.clip(idx, 0, pj - 1), axis=1)
        ups.append(jnp.where(bits > 0, w, 0))
    up = (jnp.concatenate(ups, axis=1) if ups
          else jnp.zeros((B, 0), jnp.int32))
    kpl = jnp.concatenate([refk, up >> 7], axis=1)
    cpl = jnp.concatenate([c0, up & CNT_CAP], axis=1)
    total = _unpack_u8(b32[:, o: o + L // 2])
    o += L // 2
    if ET:
        ecell = (b32[:, o: o + ET] | (b32[:, o + ET: o + 2 * ET] << 16))
        eval_ = (b32[:, o + 2 * ET: o + 3 * ET]
                 | (b32[:, o + 3 * ET: o + 4 * ET] << 16))
        # pad escapes carry cell 0xFFFFFFFF (-1 as int32) -> redirect
        # past B*L
        idx = jnp.where(ecell < 0, jnp.int32(B * L),
                        jnp.minimum(ecell + (jnp.arange(B) * L)[:, None],
                                    jnp.int32(B * L)))
        total = total.reshape(B * L)
        total = jnp.concatenate([total, jnp.zeros(1, total.dtype)]) \
            .at[idx.ravel()].set(eval_.ravel())[: B * L]
        o += 4 * ET
    else:
        total = total.reshape(B * L)
    ov = None
    if EOV:
        ovcell = (b32[:, o: o + EOV]
                  | (b32[:, o + EOV: o + 2 * EOV] << 16))
        ovkm = b32[:, o + 2 * EOV: o + 3 * EOV]
        ovcn = b32[:, o + 3 * EOV: o + 4 * EOV]
        ovrk = b32[:, o + 4 * EOV: o + 5 * EOV]
        o += 5 * EOV
        ov = (ovcell, ovkm, ovcn, ovrk)
    s0mask = b32[:, o]
    rate = jax.lax.bitcast_convert_type(
        (b32[0, o + 1] | (b32[0, o + 2] << 16)).astype(jnp.int32),
        jnp.float32)
    n_dp = b32[:, o + 3] | (b32[:, o + 4] << 16)
    nov = b32[:, o + 5] | (b32[:, o + 6] << 16)
    th = (b32[0, o + 9:o + 9 + 2 * TH:2]
          | (b32[0, o + 10:o + 10 + 2 * TH:2] << 16))
    return kpl, cpl, refk.reshape(B * L), total, ov, s0mask, rate, n_dp, \
        nov, th


@partial(jax.jit,
         static_argnames=("L", "Emax", "EOV", "ET", "FMT", "TH", "PS",
                          "chunk"))
def chain_correct_planes_batch(bufs, L, Emax, EOV, ET, FMT, TH, PS=(),
                               chunk=CHUNK):
    """Batched slot-plane chain DP: bufs [B, buflen] u16, one contig per
    row (same shape bucket; see chain_correct_packed_batch for the
    boundary-exactness mechanism — per-row scan axis, per-row s0 and
    traceback).  Returns packed [B, L] int8 result bytes."""
    b32 = bufs.astype(jnp.int32)
    B = b32.shape[0]
    kpl, cpl, refk, total, ov, s0mask, rate, n_dp, nov, th = _planes_decode(
        b32, B, L, Emax, EOV, ET, FMT, TH, PS)
    valid = (jnp.arange(L)[None, :] < n_dp[:, None]).reshape(B * L)
    s0_all = jnp.where((s0mask[:, None] >> jnp.arange(S)[None, :]) & 1 != 0,
                       jnp.float32(0.0), NEG)
    ovt = None
    if EOV:
        # flatten rows into one global entry list: each row's CELLS
        # shift by its row offset and per-row pad lanes redirect past
        # B*L (the core derives is_pad from that); cell and kmer stay
        # separate so nothing approaches the int32 limit even at
        # multi-megabase L
        ovcell, ovkm, ovcn, ovrk = ov
        lanes = jnp.arange(EOV)[None, :]
        ovc_g = jnp.where(lanes < nov[:, None],
                          ovcell + (jnp.arange(B) * L)[:, None],
                          jnp.int32(B * L))
        ovt = (ovc_g.ravel(), ovkm.ravel(), ovcn.ravel(), ovrk.ravel())
    P, msel, cov2 = _chain_planes_core(
        kpl, cpl, refk, total, valid, rate, s0_all, ovt, B, L, Emax, EOV,
        chunk)
    starts = jnp.arange(B, dtype=jnp.int32) * L
    lastidx = starts + jnp.maximum(n_dp - 1, 0)
    b_ends = msel[lastidx]
    choice = _traceback_batch(P.reshape(B, L, S), b_ends,
                              chunk).reshape(B * L)
    ohc = (choice.astype(jnp.int32)[:, None]
           == jnp.arange(S, dtype=jnp.int32))
    cov = jnp.sum(jnp.where(ohc, cov2, 0), axis=1)
    zero = (total == 1).astype(jnp.int8) << FLAGB_ZERO
    low = (cov < th[jnp.minimum(total, TH - 1)]).astype(jnp.int8) << FLAGB_COV
    return (choice | zero | low).reshape(B, L)


def chain_correct_planes(buf, L, Emax, EOV, ET, FMT, TH, PS=(),
                         chunk=CHUNK):
    """Single-contig slot-plane chain DP (one row of the batch kernel)."""
    return chain_correct_planes_batch(buf[None], L, Emax, EOV, ET, FMT,
                                      TH, PS, chunk=chunk)[0]


def pad_to_chunk(n: int, chunk: int = CHUNK) -> int:
    """Round up to a power-of-two number of chunks so jit shapes are drawn
    from a small bucket set (bounds recompilation across regions)."""
    nch = max(-(-n // chunk), 1)
    p = 1
    while p < nch:
        p *= 2
    return p * chunk


def init_state(counts0: np.ndarray) -> np.ndarray:
    """s0 from the first cell's observed kmers: every prefix base present
    gets score 0 (the C `temp` seed, lib/contig.c:459-464); state 0 is always
    live (it is the running max)."""
    s0 = np.full(S, float(NEG), dtype=np.float32)
    s0[0] = 0.0
    prefixes = np.flatnonzero(counts0.reshape(S, S, S).sum(axis=(0, 2)))
    s0[prefixes] = 0.0
    return s0


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def run_chain(counts: np.ndarray, refkmer: np.ndarray, total: np.ndarray,
              n_dp: int, rate: float, rank: np.ndarray | None = None,
              chunk: int = CHUNK) -> np.ndarray:
    """Host wrapper: sparsify + pad, run on device, return choices[:n_dp].

    `rank` is the dense [>=n_dp, K3] first-observation table; when None the
    counts' kmer-index order stands in (tests / callers without ranks)."""
    flat = counts[:n_dp].reshape(-1)
    nz = np.flatnonzero(flat)
    if rank is None:
        rk = _index_order_ranks(nz)
    else:
        rk = rank[:n_dp].reshape(-1)[nz]
    return run_chain_sparse(nz.astype(np.int64), flat[nz], rk, refkmer,
                            total, n_dp, rate, chunk)


def _index_order_ranks(nz: np.ndarray) -> np.ndarray:
    """Ranks by kmer index within each cell (fallback when no observation
    order exists, e.g. synthetic tests)."""
    cell = nz // K3
    first = np.concatenate([[0], np.flatnonzero(np.diff(cell)) + 1])
    seg = np.zeros(len(nz), dtype=np.int64)
    seg[first] = 1
    segid = np.cumsum(seg) - 1
    return (np.arange(len(nz)) - first[segid]).astype(np.uint16)


def init_state_sparse(keys0: np.ndarray) -> np.ndarray:
    """init_state from the first cell's observed kmer keys."""
    s0 = np.full(S, float(NEG), dtype=np.float32)
    s0[0] = 0.0
    s0[np.unique((keys0 >> 3) & 7)] = 0.0
    return s0


def run_chain_sparse(uk_in: np.ndarray, cn_in: np.ndarray,
                     rk_in: np.ndarray, refkmer: np.ndarray,
                     total: np.ndarray, n_dp: int, rate: float,
                     chunk: int = CHUNK) -> np.ndarray:
    """Sparse-key host wrapper: uk_in = sorted cell*K3+kmer keys (any cells
    >= n_dp are trimmed), cn_in = counts, rk_in = first-observation ranks."""
    packed = dispatch_chain_sparse(uk_in, cn_in, rk_in, refkmer, total,
                                   n_dp, rate, chunk=chunk)
    return np.asarray(packed)[:n_dp] & 7


def start_host_copy(dev) -> None:
    """Begin streaming a device result to the host without blocking.  On a
    high-RTT backend (the tunneled dev rig) a later np.asarray() then costs
    ~0 instead of a full round trip; harmless no-op when unsupported."""
    arrays = dev if isinstance(dev, (tuple, list)) else (dev,)
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:
            return


def coverage_thresholds(maxt: int, ratio: float) -> np.ndarray:
    """Integer LUT th with `cov < ratio * max(t, 1)` (f64) ⟺ cov < th[t]
    for integer cov — the FLAG_COVERAGE decision (lib/contig.c:487) as pure
    integers, so the device needs no f64."""
    t = np.maximum(np.arange(maxt + 1, dtype=np.int64), 1)
    return np.ceil(ratio * t).astype(np.int32)


# totals beyond the LUT clamp to its last entry; per-kmer counts (and thus
# cov) saturate at 0xFFFF well before this anyway
TH_CAP = 1 << 16


def dispatch_chain_sparse(uk_in: np.ndarray, cn_in: np.ndarray,
                          rk_in: np.ndarray, refkmer: np.ndarray,
                          total: np.ndarray, n_dp: int, rate: float,
                          cov_ratio: float = 0.8, chunk: int = CHUNK,
                          device=None):
    """Launch the chain DP and return the packed per-cell result byte
    (choice | flags — see chain_correct_packed) as a device array WITHOUT
    fetching — jax dispatch is async, so the caller can overlap host work
    (the next contig's pileup) with the device scan, then np.asarray() the
    result.

    `device` pins the launch (contig-level device parallelism: the
    pipeline round-robins contigs over jax.devices(), the TPU analog of
    blc_genome's contig blocks, source/nextPolish:93-117)."""
    import os

    from ..runtime import trace

    trace.count("task1.chain_cells", pad_to_chunk(max(n_dp, 1), chunk))
    trace.count("task1.chain_launches", 1)
    if os.environ.get("NPT_CHAIN_IMPL") == "entries":
        buf, L, E, TH = pack_chain_sparse(uk_in, cn_in, rk_in, refkmer,
                                          total, n_dp, rate, cov_ratio,
                                          chunk)
        if device is not None:
            import jax

            buf = jax.device_put(buf, device)
        return chain_correct_packed(buf, L, E, TH, chunk=chunk)
    buf, *shape = pack_chain_planes(
        uk_in, cn_in, rk_in, refkmer, total, n_dp, rate, cov_ratio, chunk)
    if device is not None:
        import jax

        buf = jax.device_put(buf, device)
    return chain_correct_planes(buf, *shape, chunk=chunk)


def pack_chain_sparse(uk_in, cn_in, rk_in, refkmer, total, n_dp, rate,
                      cov_ratio: float = 0.8, chunk: int = CHUNK):
    """Host packing half of dispatch_chain_sparse: build the ONE u16
    buffer; returns (buf, L, E, TH) for chain_correct_packed (bench times
    repeated launches on a pre-placed buffer this way)."""
    L = pad_to_chunk(max(n_dp, 1), chunk)
    hi = int(np.searchsorted(uk_in, n_dp * K3))
    nz = uk_in[:hi]
    E = _pow2(max(len(nz), 1))
    k0 = nz[: int(np.searchsorted(nz, K3))]
    s0mask = 1 | int(np.bitwise_or.reduce(
        1 << np.unique((k0 >> 3) & 7))) if len(k0) else 1
    maxt = int(total[:n_dp].max()) if n_dp else 1
    TH = _pow2(min(maxt + 1, TH_CAP))
    # u16 packing halves the host->device bytes; see chain_correct_packed
    buf = np.zeros(3 * E + 2 * L + 7 + 2 * TH, dtype=np.uint16)
    if len(nz):
        buf[0] = nz[0]  # < K3: cell 0 always holds its draft kmer
        np.subtract(nz[1:], nz[:-1], out=buf[1:len(nz)],
                    casting="unsafe")
    buf[E : E + len(nz)] = np.minimum(cn_in[:hi], np.iinfo(np.uint16).max)
    buf[2 * E : 2 * E + len(nz)] = rk_in[:hi]
    buf[3 * E : 3 * E + n_dp] = refkmer[:n_dp]
    np.minimum(total[:n_dp], 0xFFFF, out=buf[3 * E + L:3 * E + L + n_dp],
               casting="unsafe")
    tail = 3 * E + 2 * L
    buf[tail] = s0mask
    r32 = np.float32(rate).view(np.uint32)
    buf[tail + 1] = r32 & 0xFFFF
    buf[tail + 2] = r32 >> 16
    buf[tail + 3] = n_dp & 0xFFFF
    buf[tail + 4] = n_dp >> 16
    buf[tail + 5] = len(nz) & 0xFFFF
    buf[tail + 6] = len(nz) >> 16
    thv = coverage_thresholds(TH - 1, cov_ratio).astype(np.uint32)
    buf[tail + 7:tail + 7 + 2 * TH:2] = thv & 0xFFFF
    buf[tail + 8:tail + 8 + 2 * TH:2] = thv >> 16
    return buf, L, E, TH


def slow_fg(A: np.ndarray, s0: np.ndarray):
    """Naive f64 sequential forward/backward over transition matrices —
    oracle for the blocked scan (tests only)."""
    L = A.shape[0]
    A = A.astype(np.float64)
    f = np.zeros((L, S))
    s = s0.astype(np.float64).copy()
    for t in range(L):
        s = np.max(s[:, None] + A[t], axis=0)
        s -= s.max()
        f[t] = s
    g = np.zeros((L, S))
    v = np.zeros(S)
    g[L - 1] = v
    for t in range(L - 1, 0, -1):
        v = np.max(A[t] + v[None, :], axis=1)
        v -= v.max()
        g[t - 1] = v
    return f, g


# ---------------------------------------------------------------------------
# oracle: direct f64 transcription of the C scoring loop, for tests
# ---------------------------------------------------------------------------

def slow_chain(counts: np.ndarray, refkmer: np.ndarray, total: np.ndarray,
               rate: float, rank: np.ndarray | None = None) -> np.ndarray:
    """Per-cell transcription of contig_region_score + contig_region_correct
    (f64, python loops) with the reference's exact tie rules: kmers iterate
    in first-observation rank order, per-base entries replace on strictly
    greater only, base_max_score keeps the first maximum in insertion order.
    """
    L = counts.shape[0]
    NEGI = -1e18
    score = np.full((L, S), NEGI)
    bestk = np.zeros((L, S), dtype=np.int32)
    # score-list insertion order per (cell, base) = min kmer rank
    ins_rank = np.full((L, S), 1 << 20, dtype=np.int64)
    prev = np.full(S, NEGI)
    prev[0] = 0.0
    prev[np.flatnonzero(counts[0].reshape(S, S, S).sum(axis=(0, 2)))] = 0.0
    prev_msel = 0

    def kmer_order(c):
        ks = np.flatnonzero(counts[c])
        if rank is not None:
            ks = ks[np.argsort(rank[c, ks], kind="stable")]
        return ks

    def max_sel(sc_row, ins_row):
        """base_max_score: first max in insertion order."""
        live = np.flatnonzero(sc_row > NEGI / 2)
        live = live[np.argsort(ins_row[live], kind="stable")]
        best = live[0]
        for b in live[1:]:
            if sc_row[b] > sc_row[best]:
                best = b
        return int(best)

    for c in range(L):
        tot = int(total[c])
        tot1 = tot - 1 if tot > 1 else tot
        cur = np.full(S, NEGI)
        curk = np.zeros(S, dtype=np.int32)
        cins = np.full(S, 1 << 20, dtype=np.int64)
        for r, k in enumerate(kmer_order(c)):
            b2 = (k >> 3) & 7
            b3 = k & 7
            if b2 == 0:
                base_score = prev[prev_msel] if c else 0.0
            else:
                base_score = prev[b2]
            if base_score <= NEGI / 2:
                continue
            cnt = int(counts[c, k])
            if k == refkmer[c] and tot > 1:
                cnt -= 1
            sc = base_score + cnt - tot1 * rate
            if cins[b3] == 1 << 20:
                cins[b3] = r
            if sc > cur[b3]:
                cur[b3] = sc
                curk[b3] = k
        score[c] = cur
        bestk[c] = curk
        ins_rank[c] = cins
        prev = cur
        prev_msel = max_sel(cur, cins)
    # backtrack (contig_region_correct :473-496)
    choice = np.zeros(L, dtype=np.int8)
    b = max_sel(score[L - 1], ins_rank[L - 1])
    k = bestk[L - 1, b]
    for c in range(L - 1, -1, -1):
        choice[c] = k & 7
        if c:
            b2 = (k >> 3) & 7
            if b2 == 0:
                b2 = max_sel(score[c - 1], ins_rank[c - 1])
            k = bestk[c - 1, b2]
    return choice


@partial(jax.jit, static_argnames=("chunk",))
def chain_correct_batch(counts, rank, refkmer, total, valid, rate, s0,
                        chunk=CHUNK):
    """Batched chain_correct over R independent regions.

    counts/rank [R, L, K3], refkmer/total/valid [R, L], s0 [R, S]; one device
    launch replaces per-region calls (the no-depth rescue can have hundreds
    of tiny regions)."""
    core = partial(_chain_core, chunk=chunk)
    choice, _ = jax.vmap(core, in_axes=(0, 0, 0, 0, 0, None, 0))(
        counts, rank, refkmer, total, valid, rate, s0)
    return choice


def run_chain_batch(problems, rate, chunk=CHUNK):
    """Run many small regions in one launch.  problems = list of
    (counts[n,K3] uint16, refkmer[n], total[n], rank[n,K3] uint16);
    returns list of choice[n]."""
    if not problems:
        return []
    R = _pow2(len(problems))
    Lb = pad_to_chunk(max(c.shape[0] for c, *_ in problems), chunk)
    counts = np.zeros((R, Lb, K3), dtype=np.uint16)
    ranks = np.full((R, Lb, K3), 0xFFFF, dtype=np.uint16)
    rk = np.zeros((R, Lb), dtype=np.int32)
    tt = np.zeros((R, Lb), dtype=np.int32)
    vv = np.zeros((R, Lb), dtype=bool)
    s0 = np.full((R, S), float(NEG), dtype=np.float32)
    s0[:, 0] = 0.0
    for i, prob in enumerate(problems):
        c, r, t = prob[0], prob[1], prob[2]
        n = c.shape[0]
        counts[i, :n] = c
        if len(prob) > 3 and prob[3] is not None:
            ranks[i, :n] = prob[3]
        else:
            flat = c.reshape(-1)
            nz = np.flatnonzero(flat)
            ranks[i, :n].reshape(-1)[nz] = _index_order_ranks(nz)
        rk[i, :n] = r[:n]
        tt[i, :n] = t[:n]
        vv[i, :n] = True
        s0[i] = init_state(c[0])
    out = np.asarray(chain_correct_batch(counts, ranks, rk, tt, vv,
                                         float(rate), s0, chunk=chunk))
    return [out[i, : p[0].shape[0]] for i, p in enumerate(problems)]
