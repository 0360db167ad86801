"""Engine-1 (score_chain) tests: vectorized pileup vs slow C-transcription,
blocked tropical scan vs naive f64, and end-to-end error correction."""
import numpy as np
import pytest

from nextpolish_tpu.models.score_chain import AlgoConfig, score_chain_contig
from nextpolish_tpu.ops import pileup as pl
from nextpolish_tpu.ops import tropical
from nextpolish_tpu.ops.symbols import K3
from util_sim import (
    make_draft,
    rand_seq,
    random_messy_records,
    records_to_batch,
    simulate_reads,
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pileup_fast_matches_slow(seed):
    rng = np.random.default_rng(seed)
    L = 300
    draft = rand_seq(rng, L)
    from nextpolish_tpu.io.fasta import ASCII_TO_NIB

    nib = ASCII_TO_NIB[np.frombuffer(draft, dtype=np.uint8)]
    recs = random_messy_records(rng, L, n_reads=50)
    batch = records_to_batch(recs, L)
    levels = pl.filter_sgs_chain(batch)

    # start/end sub-regions too, not just the whole contig
    for start, end in [(0, L - 1), (37, 211), (100, 131)]:
        sidx, scounts, stotal, srefk, _ = pl.slow_pileup(
            batch, levels, 1, levels, 0, start, end, nib
        )
        index = pl.build_cell_index(batch, levels, 0, start, end)
        assert index.ins_len.tolist() == sidx.ins_len.tolist()
        assert index.n_cells == sidx.n_cells
        p = pl.build_pileup(batch, levels, 1, index, 0, nib)
        assert np.array_equal(p.refkmer, srefk)
        assert np.array_equal(p.counts.astype(np.int64), scounts), (
            f"counts mismatch at region {start}-{end}: "
            f"{np.argwhere(p.counts.astype(np.int64) != scounts)[:10]}"
        )
        assert np.array_equal(p.total, stotal.astype(np.int32))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 11])
def test_native_pileup_matches_numpy(seed):
    """native/pileup.cpp single-pass walker == numpy event expansion on
    messy CIGARs (clips, indels, sub-regions), including the sparse keys,
    counts, and per-cell totals."""
    from nextpolish_tpu import native

    if not native.available():
        pytest.skip("libnpt.so unavailable")
    rng = np.random.default_rng(seed)
    L = 400
    draft = rand_seq(rng, L)
    from nextpolish_tpu.io.fasta import ASCII_TO_NIB

    nib = ASCII_TO_NIB[np.frombuffer(draft, dtype=np.uint8)]
    recs = random_messy_records(rng, L, n_reads=80)
    batch = records_to_batch(recs, L)
    levels = pl.filter_sgs_chain(batch)
    for start, end in [(0, L - 1), (53, 311), (200, 233)]:
        index = pl.build_cell_index(batch, levels, 0, start, end)
        nat = pl._native_pileup(batch, levels, 1, index, 0, nib, 2)
        assert nat is not None
        ex = pl.expand_reads(batch, levels, 1, index, 0, 2)
        _, refkmer = pl.ref_stream(index, nib)
        keys = ex.cells * K3 + ex.kmers()
        refkeys = (np.arange(index.n_cells_dp, dtype=np.int64) * K3
                   + refkmer[: index.n_cells_dp])
        uk, cn = np.unique(np.concatenate([keys, refkeys]),
                           return_counts=True)
        total = np.bincount(ex.cells, minlength=index.n_cells).astype(
            np.int32)
        total[: index.n_cells_dp] += 1
        assert np.array_equal(nat.uk, uk)
        assert np.array_equal(nat.cn, np.minimum(cn, 0xFFFF))
        assert np.array_equal(nat.total, total)


@pytest.mark.parametrize("seed", [0, 7])
def test_blocked_scan_matches_naive(seed):
    rng = np.random.default_rng(seed)
    L = 200
    draft = rand_seq(rng, L)
    from nextpolish_tpu.io.fasta import ASCII_TO_NIB

    nib = ASCII_TO_NIB[np.frombuffer(draft, dtype=np.uint8)]
    recs = random_messy_records(rng, L, n_reads=40)
    batch = records_to_batch(recs, L)
    levels = pl.filter_sgs_chain(batch)
    index = pl.build_cell_index(batch, levels, 0, 0, L - 1)
    p = pl.build_pileup(batch, levels, 1, index, 0, nib)
    n = index.n_cells_dp

    import jax.numpy as jnp

    A = np.asarray(
        tropical.build_transition(
            tropical.emission(
                jnp.asarray(p.counts[:n].astype(np.int32)),
                jnp.asarray(p.refkmer[:n]),
                jnp.asarray(p.total[:n]),
                0.5,
            )
        )
    )
    s0 = tropical.init_state(p.counts[0])
    f, g = tropical.slow_fg(A, s0)
    naive_best = (f + g)[:, 1:].max(axis=1)
    naive_arg = (f + g)[:, 1:]

    choice = tropical.run_chain(
        p.counts.astype(np.int32), p.refkmer, p.total, n, 0.5,
        rank=p.rank, chunk=64
    )
    # the traced path must equal the C-transcription oracle byte-for-byte
    # (insertion-order tie-breaks included)
    slow = tropical.slow_chain(p.counts[:n].astype(np.int64), p.refkmer,
                               p.total, 0.5, rank=p.rank)
    assert np.array_equal(choice, slow)
    # and the path must be globally optimal: cells where the DP chains from
    # base_max_score (read-start kmers) may legitimately sit below the
    # per-cell f+g bound, so check the bound only where it is attained
    got = naive_arg[np.arange(n), choice - 1]
    assert (got <= naive_best + 1e-3).all()
    assert np.isclose(got[-1], naive_best[-1], atol=1e-3)


def test_score_chain_corrects_errors():
    rng = np.random.default_rng(42)
    true = rand_seq(rng, 1500)
    draft, ops = make_draft(rng, true, n_edits=12)
    recs = simulate_reads(rng, true, ops, read_len=100, step=4)
    batch = records_to_batch(recs, len(draft))
    polished = score_chain_contig("ctg1", draft, batch, AlgoConfig())
    assert polished.upper() == true, (
        f"polished != true: {len(polished)} vs {len(true)}"
    )
    # draft actually differed
    assert draft != true


def test_score_chain_zero_coverage_lowercase():
    rng = np.random.default_rng(3)
    true = rand_seq(rng, 600)
    draft, ops = make_draft(rng, true, n_edits=3)
    # reads only cover the first 300 true bases
    recs = [
        r
        for r in simulate_reads(rng, true, ops, read_len=100, step=4)
        if r["pos"] < 200
    ]
    batch = records_to_batch(recs, len(draft))
    polished = score_chain_contig("ctg1", draft, batch, AlgoConfig())
    # uncovered tail: draft preserved but lowercased (FLAG_ZERO)
    tail = polished[-100:]
    assert tail == tail.lower()
    assert tail.upper() in draft.upper()
    # covered interior: corrected and uppercase (the first couple of
    # positions only have draft coverage because of read-edge trimming,
    # so they are legitimately lowercased — same as the reference)
    head = polished[10:150]
    assert head == head.upper()
    assert head in true


def test_score_chain_noisy_reads():
    rng = np.random.default_rng(11)
    true = rand_seq(rng, 1200)
    draft, ops = make_draft(rng, true, n_edits=8)
    recs = simulate_reads(rng, true, ops, read_len=100, step=3,
                          err_rate=0.01)
    batch = records_to_batch(recs, len(draft))
    polished = score_chain_contig("ctg1", draft, batch, AlgoConfig())
    # with 1% read error at ~33x depth, consensus should still be exact
    assert polished.upper() == true


def test_score_chain_pipeline_matches_serial():
    """The depth-2 dispatch/fetch pipeline must emit exactly what the
    serial per-contig path emits."""
    from nextpolish_tpu.models.score_chain import score_chain_pipeline

    rng = np.random.default_rng(7)
    true = rand_seq(rng, 900)
    draft, ops = make_draft(rng, true, n_edits=6)
    recs = simulate_reads(rng, true, ops, read_len=100, step=4)
    batch = records_to_batch(recs, len(draft))
    cfg = AlgoConfig()
    serial = score_chain_contig("ctg1", draft, batch, cfg)
    piped = list(score_chain_pipeline([("ctg1", draft)] * 3, batch, cfg))
    assert len(piped) == 3
    for pname, pseq in piped:
        assert pname == "ctg1"
        assert pseq == serial


def test_native_planes_pack_matches_python():
    """The native slot-walker fast path (build_pileup_planes +
    pack_chain_planes_parts) must produce a buffer BYTE-IDENTICAL to the
    fallback (build_pileup_sparse + pack_chain_planes) on messy
    mixed-CIGAR pileups."""
    import numpy as np

    from nextpolish_tpu import native
    from nextpolish_tpu.io.fasta import ASCII_TO_NIB
    from nextpolish_tpu.models.contig_state import ContigState
    from nextpolish_tpu.models.score_chain import AlgoConfig
    from nextpolish_tpu.ops import pileup as pl
    from nextpolish_tpu.ops import tropical as tr
    from util_sim import random_messy_records, records_to_batch

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    cfg = AlgoConfig()
    for seed in (0, 7):
        rng = np.random.default_rng(seed)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        L = 4000
        draft = rng.choice(bases, L).tobytes()
        recs = random_messy_records(rng, L, n_reads=500)
        batch = records_to_batch(recs, L)
        tid = batch.header.name2id("ctg1")
        levels = pl.filter_sgs_chain(batch)
        index = pl.build_cell_index(batch, levels, tid, 0, L - 1)
        state = ContigState.from_draft("ctg1", draft, index)
        nib = ASCII_TO_NIB[np.frombuffer(draft, dtype=np.uint8)]
        view = state.index.region_view(0, L - 1)
        p = pl.build_pileup_sparse(batch, levels, 1, view, tid, nib,
                                   cfg.trim_len_edge)
        want = tr.pack_chain_planes(
            p.uk, p.cn, p.rk, p.refkmer, p.total, view.n_cells_dp, 0.5)
        fast = pl.build_pileup_planes(batch, levels, 1, view, tid, nib,
                                      cfg.trim_len_edge)
        assert fast is not None
        upper, c0, totals, stats, ov, refkmer = fast
        got = tr.pack_chain_planes_parts(
            upper, c0, totals, stats, ov, refkmer, view.n_cells_dp, 0.5)
        assert got[1:] == want[1:], (got[1:], want[1:])
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(totals[:view.n_cells_dp],
                                      p.total[:view.n_cells_dp])
