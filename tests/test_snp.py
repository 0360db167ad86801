"""Tasks 3/4 (snp_phase / snp_valid) tests."""
import numpy as np

from nextpolish_tpu.io import bam as bamio
from nextpolish_tpu.models.score_chain import AlgoConfig
from nextpolish_tpu.models.snp_phase import snp_phase_contig
from nextpolish_tpu.models.snp_valid import snp_valid_contig
from util_sim import rand_seq, records_to_batch, simulate_reads


def test_snp_phase_detects_and_phases():
    rng = np.random.default_rng(31)
    true = rand_seq(rng, 1500)
    # diploid: hap2 differs at two nearby SNPs (same read can span both)
    h1 = bytearray(true)
    h2 = bytearray(true)
    p1, p2 = 700, 760
    h2[p1] = b"A"[0] if h1[p1] != b"A"[0] else b"C"[0]
    h2[p2] = b"G"[0] if h1[p2] != b"G"[0] else b"T"[0]
    recs = []
    i = 0
    for start in range(0, len(true) - 120, 3):
        src = bytes(h1) if i % 2 == 0 else bytes(h2)
        seq = src[start : start + 120]
        recs.append(dict(
            name=f"r{i}", flag=0, tid=0, pos=start, mapq=60,
            cigar=np.array([(120 << 4) | 0], dtype=np.uint32),
            seq_nib=bamio.seq_to_nib(seq),
            qual=np.full(120, 35, np.uint8), mtid=0, mpos=0,
            tlen=300 if i % 2 == 0 else -300,
        ))
        i += 1
    batch = records_to_batch(recs, len(true))
    cfg = AlgoConfig()
    cfg.read_tlen = 300 * cfg.max_ins_fold_sgs
    out = snp_phase_contig("ctg1", bytes(h1), batch, None, cfg)
    up = out.upper()
    assert len(up) == len(true)
    # both SNP sites must carry a consistent haplotype (both h1 or both h2)
    got = (up[p1], up[p2])
    assert got in [(h1[p1], h1[p2]), (h2[p1], h2[p2])], got
    # non-SNP interior positions unchanged
    assert up[:600] == true[:600]


def test_snp_phase_no_snps_identity():
    rng = np.random.default_rng(33)
    true = rand_seq(rng, 800)
    ops = [("M", len(true))]
    recs = simulate_reads(rng, true, ops, read_len=100, step=3)
    batch = records_to_batch(recs, len(true))
    cfg = AlgoConfig()
    cfg.read_tlen = 300 * cfg.max_ins_fold_sgs
    out = snp_phase_contig("ctg1", true, batch, None, cfg)
    assert out.upper() == true


def test_snp_valid_revotes_lowercase():
    rng = np.random.default_rng(32)
    true = rand_seq(rng, 900)
    lo, hi = 400, 415
    wrong = bytes((b"ACGT"[(b"ACGT".index(bytes([c])) + 1) % 4])
                  for c in true[lo:hi])
    draft = true[:lo] + wrong.lower() + true[hi:]
    ops = [("M", len(true))]
    recs = simulate_reads(rng, true, ops, read_len=100, step=3)
    batch = records_to_batch(recs, len(draft))
    cfg = AlgoConfig()
    cfg.read_tlen = 300 * cfg.max_ins_fold_sgs
    out = snp_valid_contig("ctg1", draft, batch, None, cfg)
    assert out == true  # emit has no lowercase; region repaired
