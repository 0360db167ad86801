"""Long-read mapper tests: global segment alignment and end-to-end mapping
of noisy simulated long reads."""
import numpy as np
import pytest

from nextpolish_tpu.align.extend import band_align, traceback_batch
from nextpolish_tpu.align.index import GenomeIndex
from nextpolish_tpu.align.longread import map_long_batch
from nextpolish_tpu.align.mapper import records_to_batch
from nextpolish_tpu.align.minimizer import seq_codes
from nextpolish_tpu.io.bam import CONSUMES_Q, CONSUMES_R, cigar_to_string
from util_sim import rand_seq

_COMP = bytes.maketrans(b"ACGT", b"TGCA")


def rc(s):
    return s.translate(_COMP)[::-1]


def _noisy(rng, s: bytes, sub=0.03, ins=0.03, dele=0.03) -> bytes:
    out = bytearray()
    for ch in s:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(b"ACGT"[int(rng.integers(0, 4))])
        if r < dele + ins + sub:
            out.append(b"ACGT"[int(rng.integers(0, 4))])
        else:
            out.append(ch)
    return bytes(out)


def test_global_band_align():
    rng = np.random.default_rng(0)
    tseq = rand_seq(rng, 100)
    # query: target with a 3bp deletion
    qseq = tseq[:40] + tseq[43:]
    B = 32
    off = B // 2
    q = np.full((1, 128), 4, np.uint8)
    q[0, :97] = seq_codes(qseq)
    t = np.full((1, 128 + B), 4, np.uint8)
    t[0, off : off + 100] = seq_codes(tseq)
    tb, sc, ei, ec = band_align(q, t, np.array([97]), np.array([100]),
                                mode="global")
    ops, i_lo, j_lo, i_hi, j_hi, lead = traceback_batch(tb, ei, ec,
                                                        np.array([97]),
                                                        mode="global")
    assert int(i_lo[0]) == 0 and int(i_hi[0]) == 96
    assert int(j_hi[0]) == 99
    o = ops[0][ops[0] > 0] - 1
    assert (o == 2).sum() == 3  # exactly 3 deletions
    assert (o == 1).sum() == 0


def test_global_band_align_insertion():
    rng = np.random.default_rng(1)
    tseq = rand_seq(rng, 80)
    qseq = tseq[:30] + b"ACGT" + tseq[30:]
    B = 32
    off = B // 2
    q = np.full((1, 128), 4, np.uint8)
    q[0, :84] = seq_codes(qseq)
    t = np.full((1, 128 + B), 4, np.uint8)
    t[0, off : off + 80] = seq_codes(tseq)
    tb, sc, ei, ec = band_align(q, t, np.array([84]), np.array([80]),
                                mode="global")
    ops, i_lo, j_lo, i_hi, j_hi, lead = traceback_batch(tb, ei, ec,
                                                        np.array([84]),
                                                        mode="global")
    o = ops[0][ops[0] > 0] - 1
    assert (o == 1).sum() == 4
    assert (o == 2).sum() == 0


@pytest.fixture(scope="module")
def lr_genome():
    rng = np.random.default_rng(5)
    g = rand_seq(rng, 60000)
    idx = GenomeIndex.build([("ctg", g)], k=15, w=10)
    return g, idx


def _check_cigar_consistency(rec, read_len):
    cig = rec["cigar"]
    ql = int(((cig >> 4) * CONSUMES_Q[cig & 0xF]).sum())
    assert ql == read_len, f"cigar consumes {ql} != {read_len}"


def test_map_long_clean(lr_genome):
    g, idx = lr_genome
    rng = np.random.default_rng(6)
    reads = [g[1000:11000], rc(g[20000:35000])]
    recs = map_long_batch(idx, reads)
    assert recs[0]["tid"] == 0 and abs(recs[0]["pos"] - 1000) < 20
    assert not (recs[0]["flag"] & 16)
    assert recs[1]["tid"] == 0 and abs(recs[1]["pos"] - 20000) < 20
    assert recs[1]["flag"] & 16
    for rec, r in zip(recs, reads):
        _check_cigar_consistency(rec, len(r))


def test_map_long_noisy(lr_genome):
    g, idx = lr_genome
    rng = np.random.default_rng(7)
    n_ok = 0
    reads, truth = [], []
    for i in range(20):
        p = int(rng.integers(0, 45000))
        ln = int(rng.integers(5000, 12000))
        r = _noisy(rng, g[p : p + ln])
        if i % 2:
            r = rc(r)
        reads.append(r)
        truth.append(p)
    recs = map_long_batch(idx, reads)
    for rec, p, r in zip(recs, truth, reads):
        if rec["tid"] == 0 and abs(rec["pos"] - p) < 200:
            n_ok += 1
            _check_cigar_consistency(rec, len(r))
    assert n_ok >= 18, n_ok


def test_long_batch_filters(lr_genome):
    """Mapped long reads pass the lgs clip-ratio filter used by the engines."""
    from nextpolish_tpu.ops.pileup import filter_lgs

    g, idx = lr_genome
    rng = np.random.default_rng(8)
    reads = [_noisy(rng, g[p : p + 8000])
             for p in (2000, 9000, 30000)]
    recs = map_long_batch(idx, reads)
    batch = records_to_batch(recs, idx)
    assert len(batch) == 3
    lv = filter_lgs(batch, 0.4)
    assert (lv == 1).all()


def test_split_read_sa_tags(lr_genome):
    """A read spanning a large draft-only insertion (i.e. the true sample
    has a 6 kb segment the draft duplicates/keeps) maps as two parts:
    primary + supplementary with SA:Z tags the structural layer can turn
    into a gap candidate (set_satags/check_indel roles)."""
    from nextpolish_tpu.models.cns.structural import (
        find_sa_tag,
        read_gap_candidate,
    )

    g, idx = lr_genome  # draft
    rng = np.random.default_rng(9)
    # true genome lacks draft[20000:26000]: reads jump across that span
    true = g[:20000] + g[26000:]
    reads = [
        _noisy(rng, true[12000:30000], 0.02, 0.02, 0.02),  # spans the break
        _noisy(rng, g[40000:50000], 0.02, 0.02, 0.02),  # ordinary read
    ]
    recs = map_long_batch(idx, reads)
    prim = [r for r in recs if r["tid"] == 0 and not (r["flag"] & 0x800)]
    sup = [r for r in recs if r["tid"] == 0 and (r["flag"] & 0x800)]
    assert len(prim) == 2 and len(sup) == 1
    for rec, r in zip(recs[:2], reads):
        _check_cigar_consistency(rec, len(r))
    _check_cigar_consistency(sup[0], len(reads[0]))
    batch = records_to_batch(recs, idx)
    sa_reads = [i for i in range(len(batch)) if find_sa_tag(batch.rec_tags(i))]
    assert len(sa_reads) == 2  # split primary + its supplementary
    gaps = [read_gap_candidate(batch, i, "ctg") for i in sa_reads]
    real = [cand for cand in gaps if cand.score]
    assert real, "no gap candidate from the SA tags"
    for cand in real:
        assert abs(cand.gap_s - 20000) < 300 and abs(cand.gap_e - 26000) < 300


def test_repeat_crossing_read_chains_through():
    """A read spanning one copy of a near-identical multi-copy repeat
    must chain straight through on its flank-anchored diagonal (one
    part, correct placement) instead of splitting or dropping to
    another copy."""
    import numpy as np

    from nextpolish_tpu.align.index import GenomeIndex
    from nextpolish_tpu.align.longread import map_long_batch

    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = bytearray(rng.choice(bases, 60000).tobytes())
    seg = bytes(g[10000:13000])
    for dst in (25000, 40000, 50000):
        s2 = bytearray(seg)
        for _ in range(30):  # ~1% divergence between copies
            p = int(rng.integers(0, len(seg)))
            s2[p] = int(rng.choice(bases))
        g[dst:dst + 3000] = s2
    genome = bytes(g)
    idx = GenomeIndex.build([("ctg", genome)], k=15, w=10)
    # read spanning the 25k copy with 2kb flanks on both sides
    read = genome[23000:30000]
    recs = [r for r in map_long_batch(idx, [read]) if r["tid"] >= 0]
    assert len(recs) == 1, [hex(r["flag"]) for r in recs]
    assert abs(recs[0]["pos"] - 23000) < 50
    cig = recs[0]["cigar"]
    ops, lens = cig & 0xF, cig >> 4
    assert int(lens[ops == 0].sum()) > 6800  # nearly the whole read aligned


def test_left_align_runs():
    """Indel left-normalization: gaps in repeats shift to the leftmost
    equivalent column (canonical placement across reads), never onto the
    alignment start, and aligned base pairs are preserved."""
    import numpy as np

    from nextpolish_tpu.align.longread import _D, _I, _M, left_align_runs

    # ref: ...GC AAAAA T...  read deletes one A (placed rightmost)
    ref = np.frombuffer(b"GCAAAAAT", dtype=np.uint8)
    q = np.frombuffer(b"GCAAAAT", dtype=np.uint8)
    runs = [[_M, 6], [_D, 1], [_M, 1]]  # del of the LAST A
    out = left_align_runs(runs, q, ref, 0, 0)
    assert out == [[_M, 2], [_D, 1], [_M, 5]]  # del now leftmost A

    # insertion of an extra A into the same run, placed rightmost
    ref2 = np.frombuffer(b"GCAAAAT", dtype=np.uint8)
    q2 = np.frombuffer(b"GCAAAAAT", dtype=np.uint8)
    runs2 = [[_M, 6], [_I, 1], [_M, 1]]
    out2 = left_align_runs(runs2, q2, ref2, 0, 0)
    assert out2 == [[_M, 2], [_I, 1], [_M, 5]]

    # non-repeat context: no shift
    ref3 = np.frombuffer(b"GACGTT", dtype=np.uint8)
    q3 = np.frombuffer(b"GACTT", dtype=np.uint8)
    runs3 = [[_M, 3], [_D, 1], [_M, 2]]
    assert left_align_runs(runs3, q3, ref3, 0, 0) == [
        [_M, 3], [_D, 1], [_M, 2]]

    # a gap at the start of a homopolymer alignment must keep >= 1 M
    ref4 = np.frombuffer(b"AAAAG", dtype=np.uint8)
    q4 = np.frombuffer(b"AAAG", dtype=np.uint8)
    runs4 = [[_M, 3], [_D, 1], [_M, 1]]
    assert left_align_runs(runs4, q4, ref4, 0, 0) == [
        [_M, 1], [_D, 1], [_M, 3]]

    # dinucleotide repeat: 2-base deletion shifts by the period
    ref5 = np.frombuffer(b"CAGAGAGT", dtype=np.uint8)
    q5 = np.frombuffer(b"CAGAGT", dtype=np.uint8)
    runs5 = [[_M, 5], [_D, 2], [_M, 1]]
    out5 = left_align_runs(runs5, q5, ref5, 0, 0)
    # deleted "AG" can sit at offset 1 (C|AG AGAG) — leftmost placement
    assert out5 == [[_M, 1], [_D, 2], [_M, 5]]
