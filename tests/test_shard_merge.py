"""Reads-axis psum pileup merge (the production multi-chip task-1 path):
byte-equality of score_chain_contig_sharded / the multichip router vs the
single-chip engine on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

from nextpolish_tpu.models.score_chain import (
    AlgoConfig,
    score_chain_contig,
    score_chain_contig_sharded,
    score_chain_pipeline_multichip,
)
from util_sim import random_messy_records, records_to_batch


def _mesh(n):
    import jax

    from nextpolish_tpu.parallel.shard import reads_mesh

    if len(jax.devices()) < n:
        pytest.skip("needs the virtual multi-device mesh")
    return reads_mesh(n)


def _case(seed, L=4000, n_reads=400):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    draft = rng.choice(bases, L).tobytes()
    recs = random_messy_records(rng, L, n_reads=n_reads)
    return draft, records_to_batch(recs, L)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_contig_byte_equal(n_dev):
    mesh = _mesh(n_dev)
    draft, batch = _case(0)
    cfg = AlgoConfig()
    want = score_chain_contig("ctg1", draft, batch, cfg)
    got = score_chain_contig_sharded("ctg1", draft, batch, cfg, mesh)
    assert got == want


def test_sharded_windowed_byte_equal(monkeypatch):
    """Force multi-window processing (tiny window) — the forward-state
    chaining + backward traceback stitch must still be byte-exact."""
    import nextpolish_tpu.models.score_chain as sc

    mesh = _mesh(4)
    draft, batch = _case(1, L=6000, n_reads=500)
    cfg = AlgoConfig()
    want = score_chain_contig("ctg1", draft, batch, cfg)
    monkeypatch.setattr(sc, "SHARD_WINDOW_CELLS", 2048)
    got = score_chain_contig_sharded("ctg1", draft, batch, cfg, mesh)
    assert got == want


def test_sharded_stitch_divergence_prone_boundary(monkeypatch):
    """Pin a window boundary on a divergence-prone cell: one whose
    traceback-chosen base's winning kmer chains through the running max
    (wb2 == 0) while msel at the previous cell is nonzero.  There the
    first-cell pointer row holds the placeholder 0, and the backward
    stitch must substitute the previous window's msel — seeding with the
    raw placeholder corrupts the preceding window's traceback (1 wrong
    byte on this case before the fix)."""
    import jax.numpy as jnp

    import nextpolish_tpu.models.score_chain as sc
    import nextpolish_tpu.ops.pileup as pl
    from nextpolish_tpu.io.fasta import ASCII_TO_NIB
    from nextpolish_tpu.models.contig_state import ContigState
    from nextpolish_tpu.ops import tropical as tr
    from nextpolish_tpu.ops.symbols import K3, S

    mesh = _mesh(4)
    draft, batch = _case(3, L=6000, n_reads=500)
    cfg = AlgoConfig()

    # rebuild the full-contig winner table (wb2) and msel to locate the
    # prone boundary instead of relying on random window placement
    tid = batch.header.name2id("ctg1")
    levels = pl.filter_sgs_chain(batch)
    index = pl.build_cell_index(batch, levels, tid, 0, len(draft) - 1)
    state = ContigState.from_draft("ctg1", draft, index)
    nib = ASCII_TO_NIB[np.frombuffer(draft, dtype=np.uint8)]
    view = state.index.region_view(0, len(draft) - 1)
    p = pl.build_pileup_sparse(batch, levels, 1, view, tid, nib,
                               cfg.trim_len_edge)
    n_dp = p.index.n_cells_dp
    Lp = tr.pad_to_chunk(n_dp)
    hi = int(np.searchsorted(p.uk, n_dp * K3))
    counts = np.zeros(Lp * K3, np.int32)
    counts[p.uk[:hi]] = np.minimum(p.cn[:hi], 0xFFFF)
    counts = counts.reshape(Lp, K3)
    rank = np.full(Lp * K3, 0xFFFF, np.uint16)
    rank[p.uk[:hi]] = p.rk[:hi]
    rank = rank.reshape(Lp, K3)
    refk = np.zeros(Lp, np.int32)
    refk[:n_dp] = p.refkmer[:n_dp]
    total = np.zeros(Lp, np.int32)
    total[:n_dp] = p.total[:n_dp]
    valid = np.arange(Lp) < n_dp
    s0 = tr.init_state_sparse(p.uk[:int(np.searchsorted(p.uk, K3))])
    rate = np.float32(cfg.indel_balance_factor_sgs)

    em = tr.emission(jnp.asarray(counts), jnp.asarray(refk),
                     jnp.asarray(total), rate)
    A = tr.build_transition(em)
    A = jnp.where(jnp.asarray(valid)[:, None, None], A, tr._eye()[None])
    f = tr._forward_states(A, jnp.asarray(s0), 128)
    fprev = jnp.concatenate([jnp.asarray(s0)[None], f[:-1]], axis=0)
    emr = em.reshape(Lp, S * S, S)
    obsr = emr > tr.NEG * 0.5
    gath = fprev[:, jnp.arange(S * S, dtype=jnp.int32) % S]
    sc_e = jnp.where(obsr, gath[:, :, None] + emr, tr.NEG)
    V = jnp.max(sc_e, axis=1)
    rkr = jnp.where(obsr, jnp.asarray(rank).reshape(Lp, S * S, S)
                    .astype(jnp.int32), tr.RANK_BIG)
    winner = (sc_e == V[:, None, :]) & obsr
    wp = jnp.argmin(jnp.where(winner, rkr, tr.RANK_BIG), axis=1)
    wb2 = np.asarray(wp % S)
    Rm = jnp.min(rkr, axis=1)
    lane_obs = jnp.any(obsr, axis=1)
    Vmax = jnp.max(jnp.where(lane_obs, V, tr.NEG), axis=1)
    cand = (V == Vmax[:, None]) & lane_obs
    msel = np.asarray(jnp.argmin(jnp.where(cand, Rm, tr.RANK_BIG), axis=1))

    packed = np.asarray(tr.dispatch_chain_sparse(
        p.uk, p.cn, p.rk, p.refkmer, p.total, n_dp, float(rate)))[:n_dp]
    choice = packed & 7
    prone = [c for c in range(128, n_dp - 1, 128)
             if wb2[c, choice[c]] == 0 and msel[c - 1] != 0]
    assert prone, "case no longer has a divergence-prone 128-aligned cell"

    want = score_chain_contig("ctg1", draft, batch, cfg)
    monkeypatch.setattr(sc, "SHARD_WINDOW_CELLS", prone[0])
    got = score_chain_contig_sharded("ctg1", draft, batch, cfg, mesh)
    assert got == want


def test_multichip_router_routes_big_contigs():
    """The production router (what polish_task calls): big contigs go
    through the sharded collective, small ones through the pipeline —
    outputs byte-equal to the single-chip engine either way."""
    mesh = _mesh(4)
    cfg = AlgoConfig()
    d1, b1 = _case(2, L=5000, n_reads=400)
    pairs = [("ctg1", d1)]
    want = [(n, score_chain_contig(n, s, b1, cfg)) for n, s in pairs]
    got = list(score_chain_pipeline_multichip(pairs, b1, cfg, mesh=mesh,
                                              shard_min=1000))
    assert got == want
    # below the threshold the same call takes the pipelined path
    got2 = list(score_chain_pipeline_multichip(pairs, b1, cfg, mesh=mesh,
                                               shard_min=10 ** 9))
    assert got2 == want


def test_pipeline_windows_big_contigs_single_device(monkeypatch):
    """Contigs above NPT_CHAIN_WINDOW_BASES route through the windowed
    sharded path on a ONE-device mesh (the single-chip big-contig fix:
    a multi-megabase single launch overflows int32 keys and HBM) —
    byte-equal to the direct engine."""
    from nextpolish_tpu.models.score_chain import score_chain_pipeline

    draft, batch = _case(4, L=6000, n_reads=500)
    cfg = AlgoConfig()
    want = score_chain_contig("ctg1", draft, batch, cfg)
    monkeypatch.setenv("NPT_CHAIN_WINDOW_BASES", "2000")
    got = list(score_chain_pipeline([("ctg1", draft)], batch, cfg))
    assert got == [("ctg1", want)]
