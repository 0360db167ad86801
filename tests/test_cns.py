"""Consensus-engine (tasks 5/6) tests: tags, MSA, DP, and end-to-end
long-read polishing through the built-in mapper."""
import numpy as np
import pytest

from nextpolish_tpu.align.index import GenomeIndex
from nextpolish_tpu.align.longread import map_long_batch
from nextpolish_tpu.align.mapper import records_to_batch
from nextpolish_tpu.models.cns.dp import link_dp, traceback
from nextpolish_tpu.models.cns.msa import build_edges, pack_keys
from nextpolish_tpu.models.cns.tags import (
    ASCII_TO_CNS,
    CNS_TO_ASCII,
    TagColumns,
    build_tags,
)
from nextpolish_tpu.models.cns.window import consensus_for_contig, window_consensus
from util_sim import rand_seq

_COMP = bytes.maketrans(b"ACGT", b"TGCA")


def rc(s):
    return s.translate(_COMP)[::-1]


def _noisy(rng, s, sub=0.02, ins=0.02, dele=0.02):
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


def _edit_distance(a: bytes, b: bytes) -> int:
    """Small-scale DP edit distance (test helper)."""
    import numpy as np

    la, lb = len(a), len(b)
    prev = np.arange(lb + 1)
    aa = np.frombuffer(a, dtype=np.uint8)
    bb = np.frombuffer(b, dtype=np.uint8)
    for i in range(la):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i + 1
        sub = prev[:-1] + (bb != aa[i])
        for j in range(lb):
            cur[j + 1] = min(sub[j], prev[j + 1] + 1, cur[j] + 1)
        prev = cur
    return int(prev[-1])


def _make_batch(rng, true, draft, n_reads=40, err=0.02):
    idx = GenomeIndex.build([("ctg", draft)], k=15, w=10)
    reads = []
    L = len(true)
    for i in range(n_reads):
        a = int(rng.integers(0, max(L - 3000, 1)))
        b = min(a + int(rng.integers(2500, 4000)), L)
        r = _noisy(rng, true[a:b], err, err, err)
        if i % 2:
            r = rc(r)
        reads.append(r)
    recs = map_long_batch(idx, reads)
    return records_to_batch(recs, idx), idx


def test_msa_edges_simple():
    # two identical tiny rows: A T G with no indels
    t = np.array([0, 1, 2, 0, 1, 2], dtype=np.int32)
    d = np.zeros(6, dtype=np.int16)
    q = ASCII_TO_CNS[np.frombuffer(b"ATGATG", dtype=np.uint8)]
    cols = TagColumns(
        read_of=np.array([0, 0, 0, 1, 1, 1], np.int32),
        t_pos=t, delta=d, q_base=q,
        row_off=np.array([0, 3, 6], np.int64),
        aln_t_s=np.array([0, 0], np.int32),
        aln_t_e=np.array([2, 2], np.int32),
        ridx=np.array([0, 1], np.int64),
    )
    edges = build_edges(cols)
    assert len(edges.tag_key) == 3
    assert (edges.link == 2).all()  # both rows share all links
    cov = np.full(3, 2, dtype=np.int32)
    score, best = link_dp(edges, cov, "ont")
    cns = traceback(edges, score, best, cov, 3, "ont", min_cov=0,
                    lq_min_qv=-1)
    assert cns.base.tobytes().upper() == b"ATG"


def test_window_consensus_clean():
    """Clean reads at depth -> consensus == truth, fixing draft errors."""
    rng = np.random.default_rng(3)
    true = rand_seq(rng, 4000)
    # draft: truth with substitutions + a 2bp deletion + 2bp insertion
    draft = bytearray(true)
    draft[1000] = ord(b"A") if true[1000] != ord(b"A") else ord(b"C")
    draft[2000] = ord(b"G") if true[2000] != ord(b"G") else ord(b"T")
    draft = bytes(draft[:3000]) + bytes(draft[3002:])  # 2bp deletion
    batch, idx = _make_batch(rng, true, draft, n_reads=40, err=0.01)
    out = consensus_for_contig(batch, 0, draft, "ont")[0]
    d_before = _edit_distance(draft[:3500].upper(), true[:3500])
    d_after = _edit_distance(out[:3500].upper(), true[:3500])
    assert d_after < d_before
    assert d_after <= 6, f"consensus still {d_after} edits from truth"


def test_window_consensus_ont_noise():
    rng = np.random.default_rng(4)
    true = rand_seq(rng, 5000)
    draft = _noisy(rng, true, 0.01, 0.01, 0.01)  # 3% draft error
    batch, idx = _make_batch(rng, true, draft, n_reads=60, err=0.02)
    out = consensus_for_contig(batch, 0, draft, "ont")[0]
    d_before = _edit_distance(draft.upper(), true)
    d_after = _edit_distance(out.upper(), true)
    assert d_after < d_before * 0.25, (d_before, d_after)


def test_ctg_cns_contig_entry():
    from nextpolish_tpu.models.ctg_cns import ctg_cns_contig

    rng = np.random.default_rng(5)
    true = rand_seq(rng, 3000)
    draft = _noisy(rng, true, 0.005, 0.005, 0.005)
    batch, idx = _make_batch(rng, true, draft, n_reads=30, err=0.015)
    parts = ctg_cns_contig("ctg", draft, batch, "ont")
    assert len(parts) == 1
    name, seq = parts[0]
    assert name == "ctg"
    assert len(seq) > 2500


def test_poa_consensus():
    from nextpolish_tpu.models.cns.poa import poa_consensus

    rng = np.random.default_rng(11)
    base = rand_seq(rng, 250)
    assert poa_consensus([base, base, base]) == base
    noisy = [_noisy(rng, base, 0.02, 0.02, 0.02) for _ in range(6)]
    cns = poa_consensus(noisy)
    assert _edit_distance(cns, base) <= 3
