"""Multi-chip polishing step over a jax.sharding.Mesh.

The reference's two cross-job merges (SURVEY.md §2 'Distributed communication
backend') become collectives here:

  * per-chunk BAM merge (`samtools merge`)  ->  psum of partial pileup count
    tensors over the mesh 'reads' axis (each shard accumulates counts from
    its own read stream);
  * per-block FASTA cat  ->  windows stay sharded over the 'windows' axis
    and are gathered on host at emit time.

`sharded_polish_step` is the full device step: merge partial pileups with a
psum, then run the forward+backward tropical chain scan per window.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import tropical
from ..ops.symbols import K3, S


def make_mesh(n_devices: int | None = None, reads_axis: int | None = None
              ) -> Mesh:
    """A 2-D ('reads', 'windows') mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if reads_axis is None:
        reads_axis = 2 if n % 2 == 0 and n > 1 else 1
    wins = n // reads_axis
    arr = np.array(devs[: reads_axis * wins]).reshape(reads_axis, wins)
    return Mesh(arr, ("reads", "windows"))


def _window_chain(counts, refkmer, total, valid, s0, rate, chunk, rank=None):
    if rank is None:
        # kmer-index observation order stands in when the caller has no
        # first-observation ranks (synthetic dryrun inputs)
        obs = counts > 0
        rank = jnp.where(obs, jnp.cumsum(obs, axis=-1) - 1, 0xFFFF
                         ).astype(jnp.uint16)
    choice, _ = tropical._chain_core(counts, rank, refkmer, total, valid,
                                     rate, s0, chunk)
    return choice


def make_sharded_polish_step(mesh: Mesh, rate: float = 0.5, chunk: int = 64):
    """Build the jitted multi-chip polish step.

    Inputs (global shapes):
      counts_partial [R, W, L, K3] int32 — per-read-shard partial pileups,
        sharded P('reads', 'windows');
      refkmer [W, L], total_partial [R, W, L], valid [W, L], s0 [W, S].
    Output: corrected base choices [W, L] int8, sharded P('windows').
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("reads", "windows"), P("windows"), P("reads", "windows"),
                  P("windows"), P("windows")),
        out_specs=P("windows"),
        check_vma=False,
    )
    def step(cp, rk, tp, valid, s0):
        # the BAM-merge collective: sum partial pileups over read shards
        counts = jax.lax.psum(cp, "reads")[0]
        total = jax.lax.psum(tp, "reads")[0]
        run = jax.vmap(
            lambda c, r, t, v, s: _window_chain(c, r, t, v, s, rate, chunk)
        )
        return run(counts, rk, total, valid, s0)

    return jax.jit(step)


def reads_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D ('reads',) mesh over the available devices — the axis of the
    production reads-sharded pileup merge."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("reads",))


KBIG = np.int32(0x7FFFFFFF)  # first-observation key for unobserved slots


_MERGE_STEPS: dict = {}


def make_reads_merge_fwd(mesh: Mesh, L: int, E: int, TH: int,
                         chunk: int = 128):
    """The PRODUCTION reads-axis collective for task 1, forward half:
    each chip holds ONE shard's sparse pileup of the same contig window
    (sorted keys + counts + first-observation keys), scatters it dense on
    device, and the merge is a psum (counts, totals) / pmin
    (first-observation keys) over the 'reads' mesh axis — the collective
    realization of `samtools merge` (source/nextPolish:119-156; SURVEY
    §2 distributed backend).  The merged window then runs the tropical
    forward scan + pointer build; large contigs process as a sequence of
    windows whose state vector chains through `s0` (the pointer/argmax
    decisions are shift-invariant, so windowing is byte-exact vs a
    whole-contig run).

    Shards must partition the qualifying reads CONTIGUOUSLY in BAM
    order, with the contig-as-read row on shard 0 only; each shard's
    first-observation key is (shard_id << 16) | per_cell_rank, so the
    pmin reproduces the global observation order (all of shard r's
    events precede shard r+1's).

    Returns fwd(uk, cn, key, total_p, refkmer, th, rate, n_dp, s0,
    first) -> (P[L, S] int8 predecessor table, flags[L] int16
    (zero bit 8 | per-base low-coverage bits 0-7), msel[L] int8, fend[S]
    f32 state at the window's last valid cell)."""
    ck = ("fwd", id(mesh), L, E, TH, chunk)
    if ck in _MERGE_STEPS:
        return _MERGE_STEPS[ck]
    from functools import partial as _partial

    from ..ops.tropical import (
        _eye,
        _forward_states,
        _pointers,
        build_transition,
        emission,
    )

    @_partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("reads"), P("reads"), P("reads"), P("reads"),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def fwd(uk, cn, key, total_p, refkmer, th, rate, n_dp, s0_in, first):
        dense = jnp.zeros((L * K3 + 1,), jnp.int32).at[uk[0]].add(
            cn[0], indices_are_sorted=True, unique_indices=True)
        kd = jnp.full((L * K3 + 1,), KBIG, jnp.int32).at[uk[0]].min(
            key[0], indices_are_sorted=True, unique_indices=True)
        counts = jax.lax.psum(dense, "reads")[: L * K3].reshape(L, K3)
        kmin = jax.lax.pmin(kd, "reads")[: L * K3].reshape(L, K3)
        total = jax.lax.psum(total_p, "reads")[0]
        counts = jnp.minimum(counts, 0xFFFF)  # u16 clamp, as the 1-chip path
        obs = counts > 0
        # merged per-cell insertion order: rank of each observed kmer by
        # its min first-observation key (double argsort; keys are unique
        # per cell among observed)
        order = jnp.argsort(jnp.where(obs, kmin, KBIG), axis=1)
        rank = jnp.argsort(order, axis=1)
        rank = jnp.where(obs, rank, 0xFFFF).astype(jnp.uint16)
        valid = jnp.arange(L, dtype=jnp.int32) < n_dp
        # window 0 seeds from the first cell's observed prefixes (the C
        # `temp` seed, lib/contig.c:456-464); later windows continue from
        # the previous window's end state
        pref = counts[0].reshape(S, S, S).sum(axis=(0, 2)) > 0
        s0_first = jnp.where(pref | (jnp.arange(S) == 0), jnp.float32(0.0),
                             tropical.NEG)
        s0 = jnp.where(first, s0_first, s0_in)
        em = emission(counts, refkmer, total, rate)
        A = build_transition(em)
        A = jnp.where(valid[:, None, None], A, _eye()[None])
        f = _forward_states(A, s0, chunk)
        fprev = jnp.concatenate([s0[None], f[:-1]], axis=0)
        Ptab, msel = _pointers(em, rank, fprev, valid)
        lastidx = jnp.maximum(n_dp - 1, 0)
        fend = f[lastidx]
        covb = counts.reshape(L, S * S, S).sum(axis=1)  # [L, S]
        lowb = covb < th[jnp.minimum(total, TH - 1)][:, None]
        flags = (jnp.sum(lowb.astype(jnp.int16)
                         << jnp.arange(S, dtype=jnp.int16)[None], axis=1)
                 | ((total == 1).astype(jnp.int16) << S))
        return (Ptab.astype(jnp.int8), flags, msel.astype(jnp.int8), fend)

    fn = jax.jit(fwd)
    _MERGE_STEPS[ck] = fn
    return fn


def make_merge_traceback(mesh: Mesh, L: int, chunk: int = 128):
    """Traceback half: given one window's predecessor table and the base
    chosen at its last cell (from the next window's first-cell pointer,
    or msel at the contig end), emit the packed per-cell result byte
    (choice | FLAG_ZERO bit 3 | FLAG_COVERAGE bit 4 — the
    chain_correct_packed contract) plus the base the PREVIOUS window
    must end with.  b_prev == 0 is a PLACEHOLDER, not a real base: cell
    0's pointer row uses msel_prev[0] = 0 when the winning kmer chains
    through the running max (wb2 == 0 — that branch never yields 0
    itself), and the caller must substitute the previous window's msel
    at its last valid cell (score_chain_contig_sharded's backward
    stitch does)."""
    ck = ("tb", id(mesh), L, chunk)
    if ck in _MERGE_STEPS:
        return _MERGE_STEPS[ck]
    from ..ops.tropical import FLAGB_COV, FLAGB_ZERO, _traceback

    def tb(Ptab, flags, b_end):
        choice = _traceback(Ptab.astype(jnp.int32), b_end.astype(jnp.int32),
                            chunk)
        low = ((flags >> choice.astype(jnp.int16)) & 1).astype(jnp.int8)
        zero = ((flags >> S) & 1).astype(jnp.int8)
        packed = (choice | (zero << FLAGB_ZERO)
                  | (low << FLAGB_COV)).astype(jnp.int8)
        b_prev = Ptab[0, choice[0].astype(jnp.int32)].astype(jnp.int8)
        return packed, b_prev

    fn = jax.jit(tb)
    _MERGE_STEPS[ck] = fn
    return fn


def shard_inputs(mesh: Mesh, counts_partial, refkmer, total_partial, valid,
                 s0):
    """Place host arrays with the step's shardings."""
    s_rw = NamedSharding(mesh, P("reads", "windows"))
    s_w = NamedSharding(mesh, P("windows"))
    return (
        jax.device_put(counts_partial, s_rw),
        jax.device_put(refkmer, s_w),
        jax.device_put(total_partial, s_rw),
        jax.device_put(valid, s_w),
        jax.device_put(s0, s_w),
    )
