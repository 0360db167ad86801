"""Chain-DP tests: native vs python parity, repeat-copy selection, and
mapq ambiguity signalling."""
import numpy as np

from nextpolish_tpu import native
from nextpolish_tpu.align.chain import (
    BW, MAX_DIST, MAX_ITER, MAX_SKIP, chain_anchors, chain_dp_py,
)


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
