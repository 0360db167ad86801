"""Chain-DP tests: native vs python parity, repeat-copy selection, mapq
ambiguity signalling, and the lane-packed multi-contig task-1 batch."""
import numpy as np

from nextpolish_tpu import native
from nextpolish_tpu.align.chain import (
    BW, MAX_DIST, MAX_ITER, MAX_SKIP, chain_anchors, chain_dp_py,
)


def test_packed_batch_matches_singles():
    """chain_correct_packed_batch (contigs lane-concatenated with rank-1
    reset transitions) must byte-match per-contig launches."""
    from nextpolish_tpu.ops import tropical as tr

    rng = np.random.default_rng(5)
    K3 = 512
    cases = []
    mx = 0
    for b in range(4):
        n_dp = 1100 - b * 8  # small spread keeps one (L, E) bucket
        cells = np.repeat(np.arange(n_dp, dtype=np.int64), 4)
        kmers = rng.integers(0, K3, 4 * n_dp)
        uk = np.unique(cells * K3 + kmers)
        cn = rng.integers(1, 50, len(uk)).astype(np.int64)
        rk = tr._index_order_ranks(uk)
        refkmer = (uk[np.searchsorted(uk, np.arange(n_dp) * K3)]
                   % K3).astype(np.int32)
        total = rng.integers(2, 90, n_dp).astype(np.int32)
        mx = max(mx, int(total.max()))
        cases.append((uk, cn, rk, refkmer, total, n_dp))
    bufs, singles = [], []
    shape = None
    for uk, cn, rk, refkmer, total, n_dp in cases:
        t2 = total.copy()
        t2[0] = mx  # unify the TH bucket across lanes
        buf, L, E, TH = tr.pack_chain_sparse(uk, cn, rk, refkmer, t2,
                                             n_dp, 0.5)
        assert shape is None or shape == (L, E, TH)
        shape = (L, E, TH)
        bufs.append(buf)
        singles.append(np.asarray(
            tr.chain_correct_packed(buf, L, E, TH))[:n_dp])
    L, E, TH = shape
    batch = np.asarray(
        tr.chain_correct_packed_batch(np.stack(bufs), L, E, TH))
    for i, want in enumerate(singles):
        np.testing.assert_array_equal(batch[i][: len(want)], want)


def test_native_matches_python():
    rng = np.random.default_rng(0)
    n = 400
    # anchors along a diagonal with noise + a second diagonal (repeat)
    q = np.sort(rng.integers(0, 3000, n))
    r = q + 500 + rng.integers(-30, 30, n)
    r[150:250] += 2000  # off-diagonal block
    order = np.lexsort((q, r))
    q, r = q[order].astype(np.int64), r[order].astype(np.int64)
    f_py, p_py = chain_dp_py(q, r, 15)
    out = native.chain_dp(q, r, 15, BW, MAX_DIST, MAX_ITER, MAX_SKIP, 15.0)
    assert out is not None, "native chain_dp unavailable"
    f_c, p_c = out
    np.testing.assert_array_equal(f_py, f_c)
    np.testing.assert_array_equal(p_py, p_c)


def test_chain_prefers_fewer_gaps():
    # two candidate placements for the same query span: one colinear,
    # one needing a 300-base indel mid-chain; the DP must keep the
    # colinear one as the best chain
    q = np.arange(0, 2000, 20, dtype=np.int64)
    r_good = q + 10_000
    r_bad = q + 50_000
    r_bad[50:] += 300  # indel on the bad copy
    qp = np.concatenate([q, q])
    rp = np.concatenate([r_good, r_bad])
    chains = chain_anchors(qp, rp, 15)
    assert chains, "no chain found"
    sc, sel = chains[0]
    assert np.all(rp[sel] < 20_000), "best chain must be the gapless copy"
    if len(chains) > 1:
        assert chains[0][0] > chains[1][0]


def test_chain_extraction_splits_distant_hits():
    # anchors on two far-apart loci -> two separate chains
    q1 = np.arange(0, 1000, 25, dtype=np.int64)
    q2 = np.arange(1200, 2200, 25, dtype=np.int64)
    qp = np.concatenate([q1, q2])
    rp = np.concatenate([q1 + 5_000, q2 + 90_000])
    chains = chain_anchors(qp, rp, 15)
    assert len(chains) == 2
    spans = sorted((int(rp[sel][0]) // 1000 for _, sel in chains))
    assert spans[0] < 10 and spans[1] > 80


def test_repeat_read_gets_low_mapq():
    """A read wholly inside one copy of a perfect 2-copy repeat maps with
    mapq ~0; a read anchored in unique sequence keeps high mapq."""
    from nextpolish_tpu.align.index import GenomeIndex
    from nextpolish_tpu.align.longread import map_long_batch

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    uniq = rng.choice(bases, 30_000).tobytes()
    rep = rng.choice(bases, 6_000).tobytes()
    genome = uniq[:10_000] + rep + uniq[10_000:20_000] + rep + uniq[20_000:]
    idx = GenomeIndex.build([("ctg0", genome)], k=15, w=10)
    inside = genome[11_000:14_000]  # wholly inside repeat copy 1
    unique_read = genome[2_000:5_000]
    recs = map_long_batch(idx, [inside, unique_read])
    assert recs[0] is not None and recs[1] is not None
    assert recs[0]["mapq"] <= 5
    assert recs[1]["mapq"] >= 30


def _random_sparse_case(rng, n_dp, per, K3=512, heavy_cells=0):
    """Sorted sparse pileup entries; `heavy_cells` cells get ~20 distinct
    kmers to force the slot-plane overflow path."""
    from nextpolish_tpu.ops import tropical as tr

    cells = np.repeat(np.arange(n_dp, dtype=np.int64), per)
    kmers = rng.integers(0, K3, per * n_dp)
    if heavy_cells:
        hv = rng.choice(n_dp, heavy_cells, replace=False)
        cells = np.concatenate([cells, np.repeat(hv, 24)])
        kmers = np.concatenate([kmers, rng.integers(0, K3,
                                                    24 * heavy_cells)])
    uk = np.unique(cells * K3 + kmers)
    cn = rng.integers(1, 50, len(uk)).astype(np.int64)
    rk = tr._index_order_ranks(uk)
    refkmer = (uk[np.searchsorted(uk, np.arange(n_dp) * K3)]
               % K3).astype(np.int32)
    total = rng.integers(2, 90, n_dp).astype(np.int32)
    return uk, cn, rk, refkmer, total


def test_planes_matches_entries():
    """The slot-plane kernel (production) must byte-match the entry-space
    kernel, with and without per-cell overflow (> Emax distinct kmers)."""
    from nextpolish_tpu.ops import tropical as tr

    rng = np.random.default_rng(11)
    seen_eov = set()
    for heavy, bigcnt, per in ((0, False, 2), (0, False, 4),
                               (40, False, 4), (0, True, 2)):
        uk, cn, rk, refkmer, total = _random_sparse_case(
            rng, 1500, per, heavy_cells=heavy)
        if bigcnt:  # counts past CNT_CAP must divert to overflow exactly
            cn[rng.choice(len(cn), 60, replace=False)] += 500
            total = total + 600
        n_dp = 1500
        bufE, L, E, TH = tr.pack_chain_sparse(uk, cn, rk, refkmer, total,
                                              n_dp, 0.5)
        want = np.asarray(tr.chain_correct_packed(bufE, L, E, TH))[:n_dp]
        bufP, *shapeP = tr.pack_chain_planes(
            uk, cn, rk, refkmer, total, n_dp, 0.5)
        assert (shapeP[0], shapeP[5]) == (L, TH)
        seen_eov.add(shapeP[2] > 0)
        got = np.asarray(tr.chain_correct_planes(bufP, *shapeP))[:n_dp]
        np.testing.assert_array_equal(got, want)
    assert seen_eov == {False, True}, "need both EOV=0 and EOV>0 cases"


def test_planes_batch_matches_singles():
    """Batched slot-plane rows must byte-match per-contig launches
    (incl. rows with overflow entries)."""
    from nextpolish_tpu.ops import tropical as tr

    rng = np.random.default_rng(12)
    cases, bufs, singles = [], [], []
    for b in range(4):
        uk, cn, rk, refkmer, total = _random_sparse_case(
            rng, 1100 - 8 * b, 4, heavy_cells=10 if b >= 2 else 0)
        total[0] = 97  # unify the TH bucket across rows
        cases.append((uk, cn, rk, refkmer, total, 1100 - 8 * b))
    for uk, cn, rk, refkmer, total, n_dp in cases:
        buf, *shape = tr.pack_chain_planes(
            uk, cn, rk, refkmer, total, n_dp, 0.5)
        singles.append(np.asarray(tr.chain_correct_planes(
            buf, *shape))[:n_dp])
        bufs.append((buf, tuple(shape)))
    # rows in a real batch share one shape bucket (the pipeline stages
    # by key): batch the no-overflow pair and the overflow pair
    from collections import defaultdict

    groups = defaultdict(list)
    for i, (buf, key) in enumerate(bufs):
        groups[key].append(i)
    batched_groups = 0
    for key, idxs in groups.items():
        if len(idxs) < 2:
            continue
        batched_groups += 1
        batch = np.asarray(tr.chain_correct_planes_batch(
            np.stack([bufs[i][0] for i in idxs]), *key))
        for row, i in enumerate(idxs):
            want = singles[i]
            np.testing.assert_array_equal(batch[row][: len(want)], want)
    assert batched_groups == 2, "expected a plain and an overflow batch"


def test_f32_tie_exactness_on_and_off_grid():
    """Guard for the f32 score representation (VERDICT r4 weak #7).

    On a dyadic rate grid (rate = k/2^m, small m — e.g. the sgs default
    0.5) every chain-DP quantity is an exact multiple of 2^-m with
    magnitude far inside 2^24, so all f32 comparisons are EXACT and the
    kernel must match the f64 oracle byte-for-byte.  Off-grid rates
    (e.g. the lgs default 0.33) round — the guarded property is that
    rounding may only flip TRUE TIES (f64 top-2 margin ~ 0), never a
    decision with real margin."""
    from nextpolish_tpu.ops import tropical as tr

    from nextpolish_tpu.ops.symbols import rolling_kmers

    rng = np.random.default_rng(21)
    K3 = 512
    n_dp = 700
    # chain-connected pileup (real pileups always are, via the
    # contig-as-read): draft kmer chain at depth, plus noise kmers
    syms = rng.integers(1, 6, n_dp).astype(np.uint8)
    refkmer = rolling_kmers(syms).astype(np.int32)
    counts = np.zeros((n_dp, K3), dtype=np.int64)
    total = np.zeros(n_dp, dtype=np.int32)
    for c in range(n_dp):
        counts[c, refkmer[c]] = int(rng.integers(5, 30))
        for _ in range(int(rng.integers(0, 3))):
            # noise shares the draft prefix half the time (a real
            # substitution) and is fully random otherwise
            if rng.random() < 0.5:
                k = (int(refkmer[c]) & ~7) | int(rng.integers(1, 6))
            else:
                k = int(rng.integers(0, K3))
            counts[c, k] += int(rng.integers(1, 12))
        total[c] = counts[c].sum()
    flat = counts.reshape(-1)
    uk = np.flatnonzero(flat).astype(np.int64)
    cn = flat[uk]
    # observation order: draft kmer first (rank 0), then kmer order
    cells = uk // K3
    is_ref = (uk % K3) == refkmer[cells]
    from nextpolish_tpu.ops import tropical as _tr

    rk = _tr._index_order_ranks(uk).astype(np.int64)
    # rotate so the draft kmer takes rank 0 in every cell
    for c in np.flatnonzero(~is_ref[np.searchsorted(uk, np.arange(
            n_dp, dtype=np.int64) * K3)]):
        m = cells == c
        r_ref = int(rk[m][is_ref[m]][0]) if is_ref[m].any() else 0
        sub = rk[m]
        sub = np.where(sub == r_ref, 0, sub + (sub < r_ref))
        rk[m] = sub
    rk = rk.astype(np.uint16)
    rankd = np.full((n_dp, K3), 0xFFFF, dtype=np.uint16)
    rankd.reshape(-1)[uk] = rk
    for rate, on_grid in ((0.5, True), (0.25, True), (0.375, True),
                         (0.33, False), (0.47, False)):
        want = tr.slow_chain(counts, refkmer, total, rate, rank=rankd)
        got = tr.run_chain_sparse(uk, cn, rk, refkmer, total, n_dp, rate)
        if on_grid:
            np.testing.assert_array_equal(
                got, want, err_msg=f"on-grid rate {rate} must be exact")
        else:
            # off-grid rates round in BOTH representations (the C
            # reference's f64 rounds 0.33 too, just differently); the
            # bounded property is that f32-vs-f64 divergence stays a
            # rare tie-flip, not a systematic drift
            diff = np.flatnonzero(got != want)
            assert len(diff) <= n_dp // 100, (
                f"off-grid rate {rate}: {len(diff)} divergent cells "
                f"of {n_dp} — beyond tie-flip territory")
