"""Native (C++) consensus kernels must match the pure-Python reference
implementations byte-for-byte."""
import numpy as np
import pytest

from nextpolish_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libnpt.so unavailable")


def _random_cols(rng, L=400, n_rows=25):
    from nextpolish_tpu.models.cns.tags import TagColumns

    all_t, all_d, all_q, offs = [], [], [], [0]
    aln_s, aln_e = [], []
    # reference row
    all_t.append(np.arange(L, dtype=np.int32))
    all_d.append(np.zeros(L, dtype=np.int16))
    all_q.append(rng.integers(0, 4, L).astype(np.uint8))
    offs.append(L)
    aln_s.append(0)
    aln_e.append(L - 1)
    for _ in range(n_rows):
        s = int(rng.integers(0, L // 3))
        e = int(rng.integers(2 * L // 3, L))
        ts, ds, qs = [], [], []
        for p in range(s, e):
            ts.append(p)
            ds.append(0)
            qs.append(int(rng.integers(0, 5)))  # incl gaps
            if rng.random() < 0.08:
                for d in range(1, int(rng.integers(1, 4)) + 1):
                    ts.append(p)
                    ds.append(d)
                    qs.append(int(rng.integers(0, 4)))
        all_t.append(np.array(ts, dtype=np.int32))
        all_d.append(np.array(ds, dtype=np.int16))
        all_q.append(np.array(qs, dtype=np.uint8))
        offs.append(offs[-1] + len(ts))
        aln_s.append(s)
        aln_e.append(e - 1)
    cols = TagColumns(
        read_of=np.concatenate([np.full(len(t), i, np.int32)
                                for i, t in enumerate(all_t)]),
        t_pos=np.concatenate(all_t), delta=np.concatenate(all_d),
        q_base=np.concatenate(all_q),
        row_off=np.array(offs, dtype=np.int64),
        aln_t_s=np.array(aln_s, dtype=np.int32),
        aln_t_e=np.array(aln_e, dtype=np.int32),
        ridx=np.arange(len(aln_s), dtype=np.int64))
    coverage = np.zeros(L, dtype=np.int32)
    d0 = cols.delta == 0
    np.add.at(coverage, cols.t_pos[d0], 1)
    return cols, coverage, L


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("read_type", ["ont", "clr", "hifi", "rs"])
def test_native_dp_matches_numpy(seed, read_type):
    from nextpolish_tpu.models.cns.dp import link_dp, traceback
    from nextpolish_tpu.models.cns.msa import build_edges

    rng = np.random.default_rng(seed)
    cols, coverage, L = _random_cols(rng)
    edges = build_edges(cols)
    score, best = link_dp(edges, coverage, read_type)
    cpu = traceback(edges, score, best, coverage, L, read_type, 4, 20)
    nat = native.cns_dp(cols.t_pos, cols.delta, cols.q_base, cols.row_off,
                        coverage, L, read_type, 4, 20)
    assert nat is not None
    assert np.array_equal(cpu.pos, nat[0])
    assert cpu.base.tobytes() == nat[1].tobytes()
    assert np.array_equal(cpu.qv, nat[2])


@pytest.mark.parametrize("seed", range(6))
def test_native_poa_matches_python(seed):
    from nextpolish_tpu.models.cns.poadag import poa_to_consensus

    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 7))
    L = int(rng.integers(20, 150))
    base = rng.integers(0, 4, L)
    seqs = []
    for _ in range(k):
        s = base.copy()
        for _ in range(int(rng.integers(0, 8))):
            p = int(rng.integers(0, len(s)))
            r = rng.random()
            if r < 0.4:
                s[p] = rng.integers(0, 4)
            elif r < 0.7:
                s = np.delete(s, p)
            else:
                s = np.insert(s, p, rng.integers(0, 4))
        seqs.append(bytes(b"ATGC"[int(c)] for c in s) or b"A")
    assert native.poa_consensus(seqs) == poa_to_consensus(seqs)


@pytest.mark.parametrize("seed", range(4))
def test_native_prepare_matches_numpy(seed):
    """cns_prepare must reproduce build_edges + densify_window exactly."""
    from nextpolish_tpu.models.cns.device_dp import (MAX_E, MAX_VB,
                                                     densify_window)
    from nextpolish_tpu.models.cns.msa import build_edges

    rng = np.random.default_rng(100 + seed)
    cols, coverage, L = _random_cols(rng, L=600, n_rows=40)
    edges = build_edges(cols)
    dw = densify_window(edges, coverage, L)
    out = native.cns_prepare(cols.t_pos, cols.delta, cols.q_base,
                             cols.row_off, coverage, L, MAX_E, MAX_VB)
    assert out is not None
    ed, dn = out
    assert np.array_equal(ed["cur"], edges.cur)
    assert np.array_equal(ed["pp"], edges.pp)
    assert np.array_equal(ed["ppp"], edges.ppp)
    assert np.array_equal(ed["link"], edges.link)
    assert np.array_equal(ed["ins"], edges.ins)
    assert np.array_equal(ed["tag_key"], edges.tag_key)
    assert np.array_equal(ed["tag_off"], edges.tag_off)
    if dw is None:
        assert dn is None
        return
    assert dn is not None
    assert dn["n_levels"] == dw.n_levels
    assert dn["E"] == dw.E
    assert dn["Vb"] == dw.Vb
    assert np.array_equal(dn["level_pos"], dw.level_pos)
    assert np.array_equal(dn["meta"], dw.meta)
    assert np.array_equal(dn["ent_lvl"], dw.ent_lvl)
    assert np.array_equal(dn["ent_b"], dw.ent_b)
    assert np.array_equal(dn["ent_slot"], dw.ent_slot)
    assert np.array_equal(dn["ent_A"], dw.ent_A)
    assert np.array_equal(dn["ent_M"], dw.ent_M)
    assert np.array_equal(dn["ent_same"], dw.ent_same)
    assert np.array_equal(dn["eorder"], dw.eorder)


@pytest.mark.parametrize("read_type", ["ont", "hifi"])
def test_native_window_prep_matches_python(read_type, monkeypatch):
    """The native tag walker fast path must produce the same WindowWork
    as the python per-read loop."""
    import nextpolish_tpu.models.cns.window as W
    from test_cns import _make_batch, _noisy
    from util_sim import rand_seq

    rng = np.random.default_rng(21)
    true = rand_seq(rng, 12000)
    draft = bytes(_noisy(rng, true, 0.01, 0.01, 0.01))
    batch, _ = _make_batch(rng, true, draft, n_reads=80, err=0.05)
    ca = np.frombuffer(draft.upper(), dtype=np.uint8)
    fast = W._window_prep_native(batch, 0, ca, 0, len(draft), read_type,
                                 "ctg")
    assert fast is not None
    monkeypatch.setattr(W, "_window_prep_native",
                        lambda *a, **k: None)
    slow = W.window_prep(batch, 0, ca, 0, len(draft), read_type)
    assert np.array_equal(fast.merged.t_pos, slow.merged.t_pos)
    assert np.array_equal(fast.merged.delta, slow.merged.delta)
    assert np.array_equal(fast.merged.q_base, slow.merged.q_base)
    assert np.array_equal(fast.merged.row_off, slow.merged.row_off)
    assert np.array_equal(fast.merged.aln_t_s, slow.merged.aln_t_s)
    assert np.array_equal(fast.merged.aln_t_e, slow.merged.aln_t_e)
    assert np.array_equal(fast.merged.ridx, slow.merged.ridx)
    assert np.array_equal(fast.coverage, slow.coverage)
    assert np.array_equal(fast.l_ins, slow.l_ins)
    assert np.array_equal(fast.l_del, slow.l_del)
