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
