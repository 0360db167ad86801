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

The backward vector g is the same machinery on reversed/transposed matrices,
and the corrected base at each cell is argmax_b>=1 (f+g) — path-equivalent to
the C backtrack (ties may resolve differently; see models/score_chain.py).

Scores are kept in f32 with per-step renormalization (uniform per-cell shifts
never change any argmax in a tropical chain), avoiding f64 on TPU.
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


def tropical_compose(a, b):
    """(max,+) matrix product over the last two axes."""
    return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def _eye():
    return jnp.full((S, S), NEG).at[jnp.arange(S), jnp.arange(S)].set(0.0)


def build_transition(counts, refkmer, total, rate):
    """Per-cell augmented transition matrices A[L, S, S] from pileup counts.

    Mirrors contig_calculate_score's emission adjustments
    (lib/contig.c:424-453): candidates are observed kmers only; the draft's
    own kmer is decremented when the cell has real coverage; the per-cell
    normalizer uses total-1 when total > 1.
    """
    cnt = counts.astype(jnp.float32)
    valid = counts > 0
    dec = (total > 1).astype(jnp.float32)
    L = counts.shape[0]
    adj = cnt.at[jnp.arange(L), refkmer].add(-dec)
    tot1 = jnp.where(total > 1, total - 1, total).astype(jnp.float32)
    em = jnp.where(valid, adj - tot1[:, None] * jnp.float32(rate), NEG)
    em = em.reshape(-1, S, S, S)
    M = jnp.max(em, axis=1)  # max over b1 -> [L, b2, b3]
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


@partial(jax.jit, static_argnames=("chunk",))
def chain_correct_sparse(uk, cn, refkmer, total, valid, rate, s0,
                         chunk=CHUNK):
    """chain_correct with sparse pileup input: uk (int32 cell*K3+kmer keys),
    cn (uint16 counts; zero-count entries are padding).  Minimizes the
    host->device transfer (the tunnel to the chip is the bottleneck, not
    HBM): ~6 bytes per observed (cell, kmer) instead of 2*K3 per cell."""
    L = refkmer.shape[0]
    dense = jnp.zeros((L * K3,), jnp.uint16).at[uk].add(cn)
    return chain_correct(dense.reshape(L, K3), refkmer, total, valid, rate,
                         s0, chunk=chunk)


@partial(jax.jit, static_argnames=("L", "E", "chunk"))
def chain_correct_packed(buf, L, E, chunk=CHUNK):
    """chain_correct_sparse with every input packed into ONE int32 buffer —
    the host<->device link (a tunnel here) has high per-transfer latency, so
    six small arrays cost far more than one concatenated one.

    Layout: [uk(E) | cn(E) | refkmer(L) | total(L) | valid(L) | s0mask, rate]
    with rate bitcast into the int32 lane."""
    uk = buf[:E]
    cn = buf[E:2 * E].astype(jnp.uint16)
    rk = buf[2 * E:2 * E + L]
    total = buf[2 * E + L:2 * E + 2 * L]
    valid = buf[2 * E + 2 * L:2 * E + 3 * L] != 0
    s0mask = buf[2 * E + 3 * L]
    rate = jax.lax.bitcast_convert_type(buf[2 * E + 3 * L + 1], jnp.float32)
    s0 = jnp.where((s0mask >> jnp.arange(S)) & 1 != 0, jnp.float32(0.0), NEG)
    # keys are unique and sorted (padding -> a trash slot at L*K3), which
    # lets XLA lower the scatter without serializing the updates
    dense = jnp.zeros((L * K3 + 1,), jnp.uint16).at[uk].set(
        cn, indices_are_sorted=True, unique_indices=True)
    choice, _ = chain_correct(dense[:L * K3].reshape(L, K3), rk, total,
                              valid, rate, s0, chunk=chunk)
    return choice


@partial(jax.jit, static_argnames=("chunk",))
def chain_correct(counts, refkmer, total, valid, rate, s0, chunk=CHUNK):
    """Run the full chain DP.

    Args:
      counts: [L, 512] int32 pileup (L padded to a multiple of `chunk`).
      refkmer: [L] int32 draft 3-mer per cell.
      total:  [L] int32 cell totals.
      valid:  [L] bool — False cells get identity transitions (padding).
      rate:   indel balance factor (score normalizer).
      s0:     [S] initial state scores — 0 for prefix bases observed at the
              region's first cell (the reference's `temp` seed cell,
              lib/contig.c:456-464), NEG elsewhere.

    Returns (choice[L] int8 compact symbol, best[L] f32 path score margin).
    """
    A = build_transition(counts, refkmer, total, rate)
    A = jnp.where(valid[:, None, None], A, _eye()[None])

    # forward and backward (reversed transposes) share one batched scan
    Ar = jnp.flip(jnp.swapaxes(A, 1, 2), axis=0)
    A2 = jnp.stack([A, Ar])
    s02 = jnp.stack([s0.astype(jnp.float32), jnp.zeros((S,), jnp.float32)])
    f2 = _forward_states(A2, s02, chunk)
    f, fr = f2[0], f2[1]
    g = jnp.concatenate([jnp.flip(fr[:-1], axis=0), jnp.zeros((1, S))], axis=0)

    tot = f + g
    choice = jnp.argmax(tot[:, 1:], axis=1).astype(jnp.int8) + 1
    best = jnp.max(tot[:, 1:], axis=1)
    return choice, best


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
              n_dp: int, rate: float, chunk: int = CHUNK) -> np.ndarray:
    """Host wrapper: sparsify + pad, run on device, return choices[:n_dp]."""
    flat = counts[:n_dp].reshape(-1)
    nz = np.flatnonzero(flat)
    return run_chain_sparse(nz.astype(np.int64), flat[nz], refkmer, total,
                            n_dp, rate, chunk)


def init_state_sparse(keys0: np.ndarray) -> np.ndarray:
    """init_state from the first cell's observed kmer keys."""
    s0 = np.full(S, float(NEG), dtype=np.float32)
    s0[0] = 0.0
    s0[np.unique((keys0 >> 3) & 7)] = 0.0
    return s0


def run_chain_sparse(uk_in: np.ndarray, cn_in: np.ndarray,
                     refkmer: np.ndarray, total: np.ndarray, n_dp: int,
                     rate: float, chunk: int = CHUNK) -> np.ndarray:
    """Sparse-key host wrapper: uk_in = sorted cell*K3+kmer keys (any cells
    >= n_dp are trimmed), cn_in = counts."""
    choice = dispatch_chain_sparse(uk_in, cn_in, refkmer, total, n_dp, rate,
                                   chunk)
    return np.asarray(choice)[:n_dp]


def dispatch_chain_sparse(uk_in: np.ndarray, cn_in: np.ndarray,
                          refkmer: np.ndarray, total: np.ndarray, n_dp: int,
                          rate: float, chunk: int = CHUNK):
    """Launch the chain DP and return the device array WITHOUT fetching —
    jax dispatch is async, so the caller can overlap host work (the next
    contig's pileup) with the device scan, then np.asarray() the result."""
    L = pad_to_chunk(max(n_dp, 1), chunk)
    rk = np.zeros(L, dtype=np.int32)
    rk[:n_dp] = refkmer[:n_dp]
    t = np.zeros(L, dtype=np.int32)
    t[:n_dp] = total[:n_dp]
    v = np.zeros(L, dtype=bool)
    v[:n_dp] = True
    hi = np.searchsorted(uk_in, n_dp * K3)
    nz = uk_in[:hi]
    E = _pow2(max(len(nz), 1))
    k0 = nz[: int(np.searchsorted(nz, K3))]
    s0mask = 1 | int(np.bitwise_or.reduce(
        1 << np.unique((k0 >> 3) & 7))) if len(k0) else 1
    buf = np.zeros(2 * E + 3 * L + 2, dtype=np.int32)
    buf[:E] = L * K3  # pad keys target the trash slot past the dense array
    buf[: len(nz)] = nz
    buf[E : E + len(nz)] = np.minimum(cn_in[:hi], np.iinfo(np.uint16).max)
    buf[2 * E : 2 * E + L] = rk
    buf[2 * E + L : 2 * E + 2 * L] = t
    buf[2 * E + 2 * L : 2 * E + 3 * L] = v
    buf[2 * E + 3 * L] = s0mask
    buf[2 * E + 3 * L + 1] = np.float32(rate).view(np.int32)
    return chain_correct_packed(buf, L, E, chunk=chunk)


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
               rate: float) -> np.ndarray:
    """Per-cell transcription of contig_region_score + contig_region_correct
    (f64, python loops).  Ties: first kmer index wins, matching the fast
    path's fixed iteration order."""
    L = counts.shape[0]
    NEGI = -1e18
    score = np.full((L, S), NEGI)
    bestk = np.zeros((L, S), dtype=np.int32)
    prev = np.full(S, NEGI)
    prev[0] = 0.0
    prev[np.flatnonzero(counts[0].reshape(S, S, S).sum(axis=(0, 2)))] = 0.0
    for c in range(L):
        tot = int(total[c])
        tot1 = tot - 1 if tot > 1 else tot
        cur = np.full(S, NEGI)
        curk = np.zeros(S, dtype=np.int32)
        for k in np.flatnonzero(counts[c]):
            b2 = (k >> 3) & 7
            b3 = k & 7
            base_score = np.max(prev) if b2 == 0 else prev[b2]
            if base_score <= NEGI / 2:
                continue
            cnt = int(counts[c, k])
            if k == refkmer[c] and tot > 1:
                cnt -= 1
            sc = base_score + cnt - tot1 * rate
            if sc > cur[b3]:
                cur[b3] = sc
                curk[b3] = k
        cur[0] = np.max(cur[1:])
        score[c] = cur
        bestk[c] = curk
        prev = cur
    # backtrack (contig_region_correct :473-496)
    choice = np.zeros(L, dtype=np.int8)
    b = int(np.argmax(score[L - 1, 1:]) + 1)
    k = bestk[L - 1, b]
    for c in range(L - 1, -1, -1):
        choice[c] = k & 7
        if c:
            b2 = (k >> 3) & 7
            if b2 == 0:
                b2 = int(np.argmax(score[c - 1, 1:]) + 1)
            k = bestk[c - 1, b2]
    return choice


@partial(jax.jit, static_argnames=("chunk",))
def chain_correct_batch(counts, refkmer, total, valid, rate, s0, chunk=CHUNK):
    """Batched chain_correct over R independent regions.

    counts [R, L, K3], refkmer/total/valid [R, L], s0 [R, S]; one device
    launch replaces per-region calls (the no-depth rescue can have hundreds
    of tiny regions)."""
    R, L, _ = counts.shape
    A = jax.vmap(build_transition, in_axes=(0, 0, 0, None))(
        counts, refkmer, total, rate)
    A = jnp.where(valid[:, :, None, None], A, _eye()[None, None])
    Ar = jnp.flip(jnp.swapaxes(A, 2, 3), axis=1)
    A2 = jnp.stack([A, Ar])  # [2, R, L, S, S]
    s02 = jnp.stack([s0.astype(jnp.float32), jnp.zeros((R, S), jnp.float32)])
    f2 = _forward_states(A2, s02, chunk)
    f, fr = f2[0], f2[1]
    g = jnp.concatenate(
        [jnp.flip(fr[:, :-1], axis=1), jnp.zeros((R, 1, S))], axis=1)
    tot = f + g
    choice = jnp.argmax(tot[:, :, 1:], axis=2).astype(jnp.int8) + 1
    return choice


def run_chain_batch(problems, rate, chunk=CHUNK):
    """Run many small regions in one launch.  problems = list of
    (counts[n,K3] uint16, refkmer[n], total[n]); returns list of choice[n]."""
    if not problems:
        return []
    R = _pow2(len(problems))
    Lb = pad_to_chunk(max(c.shape[0] for c, _, _ in problems), chunk)
    counts = np.zeros((R, Lb, K3), dtype=np.uint16)
    rk = np.zeros((R, Lb), dtype=np.int32)
    tt = np.zeros((R, Lb), dtype=np.int32)
    vv = np.zeros((R, Lb), dtype=bool)
    s0 = np.full((R, S), float(NEG), dtype=np.float32)
    s0[:, 0] = 0.0
    for i, (c, r, t) in enumerate(problems):
        n = c.shape[0]
        counts[i, :n] = c
        rk[i, :n] = r[:n]
        tt[i, :n] = t[:n]
        vv[i, :n] = True
        s0[i] = init_state(c[0])
    out = np.asarray(chain_correct_batch(counts, rk, tt, vv, float(rate),
                                         s0, chunk=chunk))
    return [out[i, : p[0].shape[0]] for i, p in enumerate(problems)]
