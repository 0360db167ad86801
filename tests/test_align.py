"""Aligner tests: minimizers, index, banded extension, end-to-end mapping of
simulated reads (including reverse strand, substitutions, indels)."""
import numpy as np
import pytest

from nextpolish_tpu.align.extend import band_align, runs_to_cigar, traceback_batch
from nextpolish_tpu.align.index import GenomeIndex
from nextpolish_tpu.align.mapper import map_short_batch, records_to_batch
from nextpolish_tpu.align.minimizer import minimizers, seq_codes
from nextpolish_tpu.io.bam import cigar_to_string
from util_sim import rand_seq

_COMP = bytes.maketrans(b"ACGT", b"TGCA")


def rc(s: bytes) -> bytes:
    return s.translate(_COMP)[::-1]


def test_minimizers_basic():
    seq = rand_seq(np.random.default_rng(0), 5000)
    h, p, s = minimizers(seq, k=17, w=7)
    assert len(h) > 5000 / 7 * 0.5
    assert (np.diff(p) > 0).all()
    assert (np.diff(p) <= 7).all()  # window guarantee
    # deterministic
    h2, p2, _ = minimizers(seq, k=17, w=7)
    assert np.array_equal(p, p2)


def test_minimizers_strand_symmetry():
    seq = rand_seq(np.random.default_rng(1), 3000)
    h1, _, _ = minimizers(seq, 17, 7)
    h2, _, _ = minimizers(rc(seq), 17, 7)
    # canonical hashing: same minimizer set from either strand
    assert set(h1.tolist()) == set(h2.tolist())


def test_band_align_exact_match():
    rng = np.random.default_rng(2)
    ref = rand_seq(rng, 300)
    q = seq_codes(ref[50:150])
    t = np.full(100 + 32, 4, np.uint8)
    t[: t.size] = seq_codes(ref[50 - 16 : 50 - 16 + 132])
    tb, sc, ei, ec = band_align(q[None], t[None],
                                np.array([100]), np.array([132]))
    assert sc[0] == 100
    ops, i_lo, j_lo, i_hi, j_hi, _ = traceback_batch(tb, ei, ec, np.array([100]))
    cig = runs_to_cigar(ops[0], int(i_lo[0]), int(i_hi[0]), 100)
    assert cigar_to_string(cig) == "100M"
    assert int(j_lo[0]) == 16  # window offset recovered


def test_band_align_indel():
    rng = np.random.default_rng(3)
    ref = rand_seq(rng, 200)
    # read: ref[20:120] with a 2bp deletion at 50 and an inserted base at 80
    read = ref[20:70] + ref[72:100] + b"A" + ref[100:120]
    q = seq_codes(read)
    W = len(read) + 32
    t = seq_codes(ref[4 : 4 + W])
    tb, sc, ei, ec = band_align(q[None], t[None],
                                np.array([len(read)]), np.array([W]))
    ops, i_lo, j_lo, i_hi, j_hi, _ = traceback_batch(tb, ei, ec,
                                                  np.array([len(read)]))
    cig = cigar_to_string(runs_to_cigar(ops[0], int(i_lo[0]), int(i_hi[0]),
                                        len(read)))
    assert "D" in cig and "I" in cig
    assert cig.startswith("50M")


@pytest.fixture(scope="module")
def toy_genome():
    rng = np.random.default_rng(7)
    g = rand_seq(rng, 20000)
    idx = GenomeIndex.build([("c1", g[:12000]), ("c2", g[12000:])],
                            k=17, w=7)
    return g, idx


def test_map_short_reads_forward_reverse(toy_genome):
    g, idx = toy_genome
    rng = np.random.default_rng(8)
    reads, names, truth = [], [], []
    for i in range(200):
        p = int(rng.integers(0, 11800))
        r = g[:12000][p : p + 150]
        if len(r) < 150:
            continue
        if i % 2:
            r = rc(r)
        reads.append(r)
        names.append(f"r{i}")
        truth.append((p, i % 2))
    recs = map_short_batch(idx, reads, names)
    n_ok = 0
    for rec, (p, strand) in zip(recs, truth):
        if rec["tid"] == 0 and rec["pos"] == p and bool(rec["flag"] & 16) == bool(strand):
            n_ok += 1
    assert n_ok >= len(truth) * 0.98, f"{n_ok}/{len(truth)}"


def test_map_short_reads_with_errors(toy_genome):
    g, idx = toy_genome
    rng = np.random.default_rng(9)
    reads, truth = [], []
    for i in range(100):
        p = int(rng.integers(0, 11800))
        r = bytearray(g[:12000][p : p + 150])
        for _ in range(3):  # 2% error
            j = int(rng.integers(0, len(r)))
            r[j] = b"ACGT"[int(rng.integers(0, 4))]
        reads.append(bytes(r))
        truth.append(p)
    recs = map_short_batch(idx, reads)
    n_ok = sum(1 for rec, p in zip(recs, truth)
               if rec["tid"] == 0 and abs(rec["pos"] - p) <= 2)
    assert n_ok >= 95


def test_map_second_contig(toy_genome):
    g, idx = toy_genome
    read = g[12000:][3000:3150]
    recs = map_short_batch(idx, [read])
    assert recs[0]["tid"] == 1
    assert recs[0]["pos"] == 3000
    assert cigar_to_string(recs[0]["cigar"]) == "150M"


def test_records_to_batch_sorted(toy_genome):
    g, idx = toy_genome
    reads = [g[5000:5150], g[100:250], g[12000:][50:200]]
    recs = map_short_batch(idx, reads, ["a", "b", "c"])
    batch = records_to_batch(recs, idx)
    assert batch.names == ["b", "a", "c"]
    assert batch.pos.tolist() == [100, 5000, 50]
    assert batch.tid.tolist() == [0, 0, 1]


def test_polish_via_mapper(toy_genome):
    """Full loop: draft with errors -> map real reads -> score_chain."""
    from nextpolish_tpu.models.score_chain import AlgoConfig, score_chain_contig
    from util_sim import make_draft

    rng = np.random.default_rng(10)
    true = rand_seq(rng, 4000)
    draft, _ = make_draft(rng, true, n_edits=10)
    idx = GenomeIndex.build([("ctg", draft)], k=17, w=7)
    reads = []
    for _ in range(1200):
        p = int(rng.integers(0, len(true) - 150))
        r = true[p : p + 150]
        if rng.random() < 0.5:
            r = rc(r)
        reads.append(r)
    recs = map_short_batch(idx, reads)
    batch = records_to_batch(recs, idx)
    polished = score_chain_contig("ctg", draft, batch, AlgoConfig())
    # interior must be fully corrected (edges may lack coverage)
    assert polished.upper()[30:-30] in true


def test_device_traceback_matches_host():
    """band_align_ops (device traceback) must reproduce traceback_batch
    exactly — same op stream and coordinates — in both modes."""
    from nextpolish_tpu.align.extend import band_align_ops

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for mode, band in (("local", 32), ("global", 32)):
        Bt, R = 5, 80
        W = R + band
        off = 0 if mode == "local" else band // 2
        q = np.full((Bt, R), 4, np.uint8)
        t = np.full((Bt, W), 4, np.uint8)
        qlen = np.zeros(Bt, np.int32)
        tlen = np.zeros(Bt, np.int32)
        for b in range(Bt):
            ref = rng.integers(0, 4, R).astype(np.uint8)
            read = ref.copy()
            # a few subs + one indel
            read[rng.integers(0, R, 3)] = rng.integers(0, 4, 3)
            if b % 2:
                read = np.delete(read, 10)  # deletion in read
            ql = read.size - (5 if mode == "local" else 0)
            q[b, :ql] = read[:ql]
            t[b, off : off + R] = ref
            qlen[b] = ql
            tlen[b] = R
        kw = dict(match=2, mismatch=4, gapo=4, gape=2, mode=mode)
        tb, sc, ei, ec = band_align(q, t, qlen, tlen, **kw)
        ops_h, i_lo, j_lo, i_hi, j_hi, lead = traceback_batch(
            tb, ei, ec, qlen, mode=mode)
        ops_d, sc2, i_lo2, j_lo2, i_hi2, j_hi2, lead2 = band_align_ops(
            q, t, qlen, tlen, **kw)
        assert np.array_equal(sc, sc2)
        assert np.array_equal(i_lo, i_lo2)
        assert np.array_equal(j_lo, j_lo2)
        assert np.array_equal(i_hi, i_hi2)
        assert np.array_equal(j_hi, j_hi2)
        assert np.array_equal(lead, lead2)
        for b in range(Bt):
            ha = ops_h[b][ops_h[b] > 0]
            da = ops_d[b][ops_d[b] > 0]
            assert np.array_equal(ha, da), (mode, b)


def test_pe_mate_rescue():
    """A mate whose every seed k-mer is broken still gets placed by the
    banded rescue in the insert window (bwa mem_matesw role)."""
    import numpy as np

    from nextpolish_tpu.align.index import GenomeIndex
    from nextpolish_tpu.align.mapper import map_short_batch

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    true = rng.choice(bases, 30000).tobytes()
    idx = GenomeIndex.build([("ctg", true)], k=15, w=10)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    seqs = []
    for i in range(60):
        s = int(rng.integers(0, 30000 - 500))
        r1 = true[s:s + 150]
        r2 = true[s + 300:s + 450].translate(comp)[::-1]
        if i % 3 == 0:
            arr = bytearray(r2)
            for j in range(0, 150, 11):  # an error inside every 15-mer
                arr[j] = b"ACGT"[(arr[j] + 1) % 4]
            r2 = bytes(arr)
        seqs.append(r1)
        seqs.append(r2)
    recs = map_short_batch(idx, seqs, paired=True)
    corrupted = [recs[2 * i + 1] for i in range(60) if i % 3 == 0]
    mapped = [r for r in corrupted if not (r["flag"] & 4)]
    assert len(mapped) >= len(corrupted) * 0.8
    assert all(r["mapq"] <= 40 for r in mapped)  # mate-evidence cap
