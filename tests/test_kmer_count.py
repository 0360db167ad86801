"""Task-2 (kmer_count) tests: region morphology and end-to-end repair of
lowercase (low-quality) regions left by task 1."""
import numpy as np

from nextpolish_tpu.models.contig_state import (
    ContigState,
    find_regions,
    merge_regions,
)
from nextpolish_tpu.models.flags import FLAG_ZERO
from nextpolish_tpu.models.kmer_count import kmer_count_contig
from nextpolish_tpu.models.score_chain import AlgoConfig, score_chain_contig
from nextpolish_tpu.ops.pileup import CellIndex
from util_sim import make_draft, rand_seq, records_to_batch, simulate_reads


def _flat_state(seq: bytes) -> ContigState:
    L = len(seq)
    idx = CellIndex(0, L - 1, np.zeros(L, dtype=np.int64),
                    np.arange(L, dtype=np.int64), L, L)
    return ContigState.from_draft("c", seq, idx)


def test_find_regions_simple():
    seq = b"ACGT" * 5 + b"acgtac" + b"ACGT" * 5 + b"ac" + b"ACGT" * 5
    st = _flat_state(seq)
    # lowercase runs at [20,25] and [46,47]
    regions = find_regions(st, 0, len(seq) - 1, gap=0, con=3,
                           flag_bit=FLAG_ZERO, extend=False, ext_len_edge=2)
    # only the 6-long run qualifies (con=3 needs >3 consecutive)
    assert regions == [(18, 27)]
    regions2 = find_regions(st, 0, len(seq) - 1, gap=5, con=0,
                            flag_bit=FLAG_ZERO, extend=False, ext_len_edge=2)
    assert regions2 == [(18, 27), (44, 49)]


def test_merge_regions():
    assert merge_regions([(0, 5), (5, 8), (7, 10)]) == [(0, 5), (5, 10)]
    assert merge_regions([(2, 4), (10, 12)]) == [(2, 4), (10, 12)]
    assert merge_regions([]) == []


def test_kmer_count_repairs_lowercase_region():
    """Task-2 scenario: draft = truth except a lowercase window of wrong
    bases (substitutions, so read alignments stay all-M)."""
    rng = np.random.default_rng(5)
    true = rand_seq(rng, 1200)
    lo, hi = 400, 420
    wrong = bytes((b"ACGT"[(b"ACGT".index(bytes([c])) + 1) % 4])
                  for c in true[lo:hi])
    draft = true[:lo] + wrong.lower() + true[hi:]
    ops = [("M", len(true))]
    recs = simulate_reads(rng, true, ops, read_len=100, step=3)
    batch = records_to_batch(recs, len(draft))
    cfg = AlgoConfig()
    cfg.read_tlen = 300 * cfg.max_ins_fold_sgs
    polished = kmer_count_contig("ctg1", draft, batch, cfg)
    assert polished.upper() == true
    # the repaired window is uppercased (FLAG_ZERO cleared by the vote)
    assert polished[lo:hi] == true[lo:hi]


def test_kmer_count_repairs_deletion_with_inserts():
    """Draft missing 3 bases inside a lowercase window: reads carry an I op,
    the vote row spans insert cells, and the deletion is restored."""
    rng = np.random.default_rng(17)
    true = rand_seq(rng, 1000)
    cut = 500
    draft = (true[:cut - 10]
             + true[cut - 10 : cut].lower()
             + true[cut + 3 : cut + 13].lower()
             + true[cut + 13 :])
    ops = [("M", cut), ("I", 3), ("M", len(true) - cut - 3)]
    recs = simulate_reads(rng, true, ops, read_len=100, step=3)
    batch = records_to_batch(recs, len(draft))
    cfg = AlgoConfig()
    cfg.read_tlen = 300 * cfg.max_ins_fold_sgs
    polished = kmer_count_contig("ctg1", draft, batch, cfg)
    assert polished.upper() == true


def test_kmer_count_no_coverage_keeps_lowercase():
    rng = np.random.default_rng(9)
    true = rand_seq(rng, 900)
    draft, ops = make_draft(rng, true, n_edits=4)
    # no reads over the back third
    recs = [
        r
        for r in simulate_reads(rng, true, ops, read_len=100, step=3)
        if r["pos"] < 450
    ]
    batch = records_to_batch(recs, len(draft))
    cfg = AlgoConfig()
    cfg.read_tlen = 300 * cfg.max_ins_fold_sgs
    polished1 = score_chain_contig("ctg1", draft, batch, cfg)
    tail1 = polished1[-100:]
    assert tail1 == tail1.lower()  # task 1 lowercases uncovered tail
    polished2 = kmer_count_contig("ctg1", polished1, batch, cfg)
    tail2 = polished2[-100:]
    # still uncovered -> still lowercase, bases preserved
    assert tail2 == tail2.lower()
    assert tail2.upper() == tail1.upper()
