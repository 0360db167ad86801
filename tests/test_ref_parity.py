"""Byte-parity tests against the reference NextPolish engine compiled from
the reference tree (tools/build_ref_oracle.sh).  Skipped when the oracle
.so is absent.

These run our mapper-produced alignments through BOTH engines, isolating
engine semantics from aligner differences."""
import os
import subprocess
import sys

import numpy as np
import pytest

REF_SO = "/tmp/refbuild/lib/nextpolish1.so"


@pytest.fixture(scope="module")
def ref_lib():
    if not os.path.exists(REF_SO):
        script = os.path.join(os.path.dirname(__file__), "..", "tools",
                              "build_ref_oracle.sh")
        try:
            subprocess.run(["bash", script], check=True, capture_output=True,
                           timeout=600)
        except Exception:
            pytest.skip("reference oracle could not be built")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from ref_parity import load_ref_lib

    return load_ref_lib(REF_SO)


def _setup(tmp_path, rng, L=3000, n_edits=8, depth=35):
    from util_sim import make_draft, rand_seq, records_to_batch, simulate_reads

    true = rand_seq(rng, L)
    draft, ops = make_draft(rng, true, n_edits=n_edits)
    recs = simulate_reads(rng, true, ops, read_len=100,
                          step=max(300 // depth, 2), err_rate=0.005)
    batch = records_to_batch(recs, len(draft))
    fa = tmp_path / "genome.fa"
    fa.write_bytes(b">ctg1\n" + draft + b"\n")
    from ref_parity import batch_to_bam, write_fai

    write_fai(str(fa))
    bam = tmp_path / "reads.sort.bam"
    batch_to_bam(batch, str(bam))
    return true, draft, batch, str(fa), str(bam)


def _upper_only(s: bytes) -> bytes:
    return bytes(c for c in s if 65 <= c <= 90)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_score_chain_byte_parity(ref_lib, tmp_path, seed):
    """Full byte equality with the reference engine, including lowercase
    low-qv tie sites: score ties resolve by per-cell kmer first-observation
    rank, mirroring the reference's SeqList insertion order
    (lib/base.c:159-199)."""
    from ref_parity import run_reference

    from nextpolish_tpu.models.score_chain import AlgoConfig, score_chain_contig

    rng = np.random.default_rng(seed)
    true, draft, batch, fa, bam = _setup(tmp_path, rng)
    ref_out = run_reference(ref_lib, "score_chain", fa, bam)
    ours = score_chain_contig("ctg1", draft, batch, AlgoConfig())
    assert ours == ref_out["ctg1"]


@pytest.mark.parametrize("depth", [3, 6])
def test_score_chain_byte_parity_low_depth(ref_lib, tmp_path, depth):
    """Low depth maximizes score ties (the insertion-order tie-break's
    stress case); output must still be byte-equal."""
    from ref_parity import run_reference

    from nextpolish_tpu.models.score_chain import AlgoConfig, score_chain_contig

    rng = np.random.default_rng(depth)
    true, draft, batch, fa, bam = _setup(tmp_path, rng, L=2000, n_edits=10,
                                         depth=depth)
    ref_out = run_reference(ref_lib, "score_chain", fa, bam)
    ours = score_chain_contig("ctg1", draft, batch, AlgoConfig())
    assert ours == ref_out["ctg1"]


def test_kmer_count_byte_parity(ref_lib, tmp_path):
    from ref_parity import run_reference

    from nextpolish_tpu.models.kmer_count import kmer_count_contig
    from nextpolish_tpu.models.score_chain import (
        AlgoConfig,
        estimate_read_tlen,
        score_chain_contig,
    )

    rng = np.random.default_rng(7)
    true, draft, batch, fa, bam = _setup(tmp_path, rng)
    # run task 1 first so task 2 has lowercase regions, via the REFERENCE
    # engine (both engines proved byte-equal on task 1)
    ref1 = run_reference(ref_lib, "score_chain", fa, bam)["ctg1"]
    fa2 = tmp_path / "after1.fa"
    fa2.write_bytes(b">ctg1\n" + ref1 + b"\n")
    from ref_parity import write_fai

    write_fai(str(fa2))
    ref2 = run_reference(ref_lib, "kmer_count", str(fa2), bam)["ctg1"]
    cfg = AlgoConfig()
    cfg.read_tlen = estimate_read_tlen(batch, cfg)
    ours2 = kmer_count_contig("ctg1", ref1, batch, cfg)
    assert ours2 == ref2, f"len ours={len(ours2)} ref={len(ref2)}"


REF2_SO = "/tmp/refbuild/lib/nextpolish2.so"


@pytest.fixture(scope="module")
def ref2_lib(ref_lib):
    # ref_lib ensures the oracle tree is built; nextpolish2.so comes from
    # the same build script
    if not os.path.exists(REF2_SO):
        pytest.skip("reference engine-2 oracle missing")
    from ref_parity2 import load_ref2

    return load_ref2(REF2_SO)


@pytest.mark.parametrize("seed,read_type", [(0, "ont"), (3, "ont"),
                                            (1, "clr"), (2, "hifi"),
                                            (4, "rs")])
def test_ctg_cns_byte_parity(ref2_lib, tmp_path, seed, read_type):
    """Engine-2 consensus must match the reference byte-for-byte
    (including lowercase low-qv marking) on identical BAMs."""
    from ref_parity import batch_to_bam, write_fai
    from ref_parity2 import run_reference_cns

    from util_sim import make_draft, rand_seq, records_to_batch, simulate_reads

    from nextpolish_tpu.models.ctg_cns import ctg_cns_contig

    rng = np.random.default_rng(seed)
    true = rand_seq(rng, 6000)
    draft, ops = make_draft(rng, true, n_edits=12)
    recs = simulate_reads(rng, true, ops, read_len=2000, step=151,
                          err_rate=0.03)
    batch = records_to_batch(recs, len(draft))
    fa = tmp_path / "genome.fa"
    fa.write_bytes(b">ctg1\n" + draft + b"\n")
    write_fai(str(fa))
    bam = tmp_path / "lgs.sort.bam"
    batch_to_bam(batch, str(bam))
    ref_out = run_reference_cns(ref2_lib, str(fa), str(bam), read_type)
    ours = ctg_cns_contig("ctg1", draft, batch, read_type)[0][1]
    ref = ref_out["ctg1"][0]
    assert ours == ref, (
        f"len ours={len(ours)} ref={len(ref)} "
        f"upper_eq={ours.upper() == ref.upper()}")


def test_window_stitch_byte_parity(ref2_lib, tmp_path):
    """Multi-window consensus + link_consensus stitch must match the
    reference byte-for-byte (overlap shrunk via the oracle's test hook)."""
    import ctypes

    from ref_parity import batch_to_bam, write_fai
    from ref_parity2 import READS_TYPE

    from util_sim import make_draft, rand_seq, records_to_batch, simulate_reads

    from nextpolish_tpu.models.cns.window import consensus_for_contig

    os.environ["NPT_TEST_OVERLAP"] = "8000"
    try:
        rng = np.random.default_rng(5)
        true = rand_seq(rng, 120_000)
        draft, ops = make_draft(rng, true, n_edits=40)
        recs = simulate_reads(rng, true, ops, read_len=2500, step=149,
                              err_rate=0.02)
        batch = records_to_batch(recs, len(draft))
        fa = tmp_path / "genome.fa"
        fa.write_bytes(b">ctg1\n" + draft + b"\n")
        write_fai(str(fa))
        bam = tmp_path / "lgs.sort.bam"
        batch_to_bam(batch, str(bam))
        (tmp_path / "bam.list").write_text(str(bam) + "\n")
        refs = ref2_lib.read_ref(str(fa).encode(), None, 0)
        cfg = ref2_lib.ctg_cns_init(40_000, READS_TYPE["ont"], 0,
                                    0.8, 0.8, 0.8)
        res = ref2_lib.ctg_cns_core(cfg, ctypes.byref(refs.contents.ref[0]),
                                    str(tmp_path / "bam.list").encode())
        ref_seq = ctypes.string_at(res.contents.data[0].seq)
        ours = consensus_for_contig(batch, 0, draft, "ont", window=40_000,
                                    overlap=8_000)[0]
        assert ours == ref_seq
    finally:
        os.environ.pop("NPT_TEST_OVERLAP", None)


def test_structural_layer_byte_parity(ref2_lib, tmp_path):
    """Contigs >100 kb with split reads activate the structural layer:
    SA-tag gap clusters, depth track, low-depth split points.  Both split
    modes must match the reference byte-for-byte."""
    import ctypes

    from ref_parity import write_fai
    from ref_parity2 import READS_TYPE

    from util_sim import rand_seq

    from nextpolish_tpu.io import bam as bamio
    from nextpolish_tpu.models.cns.window import consensus_for_contig

    rng = np.random.default_rng(21)
    LT = 150_000
    true = rand_seq(rng, LT)
    J = 80_000  # the draft has a 3 kb spurious insertion at J
    draft = true[:J] + rand_seq(rng, 3_000) + true[J:]
    HOLE = (40_000, 41_000)  # read gap -> low-depth split point
    RL, STEP = 6000, 230
    BASES = b"ACGT"

    def mut(seq):
        s = bytearray(seq)
        for i in range(len(s)):
            if rng.random() < 0.01:
                s[i] = BASES[int(rng.integers(0, 4))]
        return bytes(s)

    def sa_aux(pos1, cigar):
        return b"SAZ" + f"ctg1,{pos1},+,{cigar},60,0;".encode() + b"\x00"

    import re

    recs = []

    def add(pos, cigstr, seq, flag=0, tags=b""):
        cigar = np.array(
            [(int(ln) << 4) | "MIDNSHP=X".index(op)
             for ln, op in re.findall(r"(\d+)([MIDNSHP=X])", cigstr)],
            dtype=np.uint32)
        recs.append(dict(name=f"r{len(recs)}", flag=flag, tid=0, pos=pos,
                         mapq=60, cigar=cigar,
                         seq_nib=bamio.seq_to_nib(seq),
                         qual=np.full(len(seq), 35, np.uint8), mtid=-1,
                         mpos=-1, tlen=0, tags=tags))

    for start in range(0, LT - RL + 1, STEP):
        if not (start + RL <= HOLE[0] or start >= HOLE[1]):
            continue
        seq = mut(true[start : start + RL])
        if start + RL <= J:
            add(start, f"{RL}M", seq)
        elif start >= J:
            add(start + 3000, f"{RL}M", seq)
        else:
            left = J - start
            right = RL - left
            if left < 120 or right < 120:
                if left >= right:
                    add(start, f"{left}M{right}S", seq)
                else:
                    add(J + 3000, f"{left}S{right}M", seq)
            else:
                pri = f"{left}M{right}S"
                sup = f"{left}S{right}M"
                add(start, pri, seq, 0, sa_aux(J + 3001, sup))
                add(J + 3000, sup, seq, 0x800, sa_aux(start + 1, pri))

    recs.sort(key=lambda r: r["pos"])
    fa = tmp_path / "genome.fa"
    fa.write_bytes(b">ctg1\n" + draft + b"\n")
    write_fai(str(fa))
    bam = tmp_path / "lgs.sort.bam"
    bamio.write_bam(str(bam),
                    bamio.BamHeader("@HD\tVN:1.6\n", ["ctg1"], [len(draft)]),
                    recs, index=True)
    batch = bamio.read_bam(str(bam), with_names=True)
    (tmp_path / "bam.list").write_text(str(bam) + "\n")

    os.environ["NPT_TEST_OVERLAP"] = "20000"
    try:
        refs = ref2_lib.read_ref(str(fa).encode(), None, 0)
        for split in (0, 1):
            cfg = ref2_lib.ctg_cns_init(100_000, READS_TYPE["ont"], split,
                                        0.8, 0.8, 0.8)
            res = ref2_lib.ctg_cns_core(
                cfg, ctypes.byref(refs.contents.ref[0]),
                str(tmp_path / "bam.list").encode())
            ref_parts = [ctypes.string_at(res.contents.data[j].seq)
                         for j in range(res.contents.i_m)]
            ours = consensus_for_contig(batch, 0, draft, "ont",
                                        window=100_000, overlap=20_000,
                                        split=split, contig_name="ctg1")
            assert len(ours) == len(ref_parts), (split, len(ours),
                                                 len(ref_parts))
            for a, b in zip(ours, ref_parts):
                assert a == b, (split, len(a), len(b))
            if split == 1:
                assert len(ref_parts) == 2  # the hole splits the contig
    finally:
        os.environ.pop("NPT_TEST_OVERLAP", None)


def test_lgspolish_byte_parity(ref_lib, tmp_path):
    """Legacy engine-1 task 5 (lgspolish) must match the reference."""
    import ctypes

    from ref_parity import batch_to_bam, write_fai

    from util_sim import make_draft, rand_seq, records_to_batch, simulate_reads

    from nextpolish_tpu.models.lgs_polish import lgspolish_contig
    from nextpolish_tpu.models.score_chain import AlgoConfig

    rng = np.random.default_rng(9)
    true = rand_seq(rng, 8000)
    draft, ops = make_draft(rng, true, n_edits=14)
    recs = simulate_reads(rng, true, ops, read_len=1500, step=101,
                          err_rate=0.04)
    batch = records_to_batch(recs, len(draft))
    fa = tmp_path / "genome.fa"
    fa.write_bytes(b">ctg1\n" + draft + b"\n")
    write_fai(str(fa))
    bam = tmp_path / "lgs.sort.bam"
    batch_to_bam(batch, str(bam))
    cfg_ref = ref_lib.config_init(str(fa).encode(), str(bam).encode(),
                                  str(bam).encode())
    res = ref_lib.lgspolish(b"ctg1", cfg_ref)
    ref = ctypes.string_at(res.contents.contig)
    ours = lgspolish_contig("ctg1", draft, batch, AlgoConfig())
    assert ours == ref


def test_snp_phase_byte_parity(ref_lib, tmp_path):
    """Task 3 (snp_phase) must match the reference byte-for-byte on a
    diploid simulation with draft errors and short+long reads."""
    import ctypes

    from ref_parity import batch_to_bam, write_fai, run_reference

    from util_sim import make_draft, rand_seq, records_to_batch, simulate_reads

    from nextpolish_tpu.models.snp_phase import snp_phase_contig
    from nextpolish_tpu.models.snp_valid import snp_valid_contig
    from nextpolish_tpu.models.score_chain import AlgoConfig, estimate_read_tlen

    rng = np.random.default_rng(42)
    L = 12000
    true = rand_seq(rng, L)
    h2 = bytearray(true)
    BASES = b"ACGT"
    for p in sorted(rng.choice(np.arange(200, L - 200), 24, replace=False)):
        cur = h2[p]
        alt = BASES[int(rng.integers(0, 4))]
        while alt == cur:
            alt = BASES[int(rng.integers(0, 4))]
        h2[p] = alt
    h2 = bytes(h2)
    draft, ops = make_draft(rng, true, n_edits=5)
    recs = (simulate_reads(rng, true, ops, read_len=150, step=9,
                           err_rate=0.002)
            + simulate_reads(rng, h2, ops, read_len=150, step=9,
                             err_rate=0.002))
    for i, r in enumerate(recs):
        r["name"] = f"r{i}"
    recs.sort(key=lambda r: r["pos"])
    sgs = records_to_batch(recs, len(draft))
    lrecs = (simulate_reads(rng, true, ops, read_len=2500, step=307,
                            err_rate=0.02)
             + simulate_reads(rng, h2, ops, read_len=2500, step=307,
                              err_rate=0.02))
    for i, r in enumerate(lrecs):
        r["name"] = f"l{i}"
    lrecs.sort(key=lambda r: r["pos"])
    lgs = records_to_batch(lrecs, len(draft))
    fa = tmp_path / "genome.fa"
    fa.write_bytes(b">ctg1\n" + draft + b"\n")
    write_fai(str(fa))
    sgs_bam = tmp_path / "sgs.bam"
    lgs_bam = tmp_path / "lgs.bam"
    batch_to_bam(sgs, str(sgs_bam))
    batch_to_bam(lgs, str(lgs_bam))
    cfg_ref = ref_lib.config_init(str(fa).encode(), str(sgs_bam).encode(),
                                  str(lgs_bam).encode())
    res = ref_lib.snp_phase(b"ctg1", cfg_ref)
    ref3 = ctypes.string_at(res.contents.contig)
    cfg = AlgoConfig()
    cfg.read_tlen = estimate_read_tlen(sgs, cfg)
    ours3 = snp_phase_contig("ctg1", draft, sgs, lgs, cfg)
    assert ours3 == ref3

    # task 4 on top of the reference's task-3 output
    fa2 = tmp_path / "after3.fa"
    fa2.write_bytes(b">ctg1\n" + ref3 + b"\n")
    write_fai(str(fa2))
    cfg_ref4 = ref_lib.config_init(str(fa2).encode(), str(sgs_bam).encode(),
                                   str(lgs_bam).encode())
    res4 = ref_lib.snp_valid(b"ctg1", cfg_ref4)
    ref4 = ctypes.string_at(res4.contents.contig)
    cfg2 = AlgoConfig()
    cfg2.read_tlen = estimate_read_tlen(sgs, cfg2)
    ours4 = snp_valid_contig("ctg1", ref3, sgs, lgs, cfg2)
    assert ours4 == ref4


def test_debug_trace_parity(ref_lib, tmp_path):
    """-debug PolishPoint trace (trace_polish_open): our debug_points must
    report the same (pos, index, curbase, draftbase) tuples as the
    reference engine's trace (lib/contig.c:743-777)."""
    import ctypes

    from util_sim import make_draft, rand_seq, records_to_batch, simulate_reads

    rng = np.random.default_rng(9)
    # error-free reads: no low-qv tie sites, so the two engines emit the
    # same sequence and the traces must be identical (tie sites resolve
    # differently by documented deviation and are excluded from parity)
    true = rand_seq(rng, 3000)
    draft, ops = make_draft(rng, true, n_edits=8)
    recs = simulate_reads(rng, true, ops, read_len=100, step=8, err_rate=0.0)
    batch = records_to_batch(recs, len(draft))
    fa = str(tmp_path / "genome.fa")
    open(fa, "wb").write(b">ctg1\n" + draft + b"\n")
    from ref_parity import PolishPoint, PolishResult, batch_to_bam, write_fai

    write_fai(fa)
    bam = str(tmp_path / "reads.sort.bam")
    batch_to_bam(batch, bam)

    # enable trace_polish_open: mirror of lib/config.h:25-67 field layout
    class _Cfg(ctypes.Structure):
        _fields_ = [
            ("trim_len_edge", ctypes.c_uint8),
            ("ext_len_edge", ctypes.c_uint8),
            ("min_map_quality", ctypes.c_uint8),
            ("indel_balance_factor_sgs", ctypes.c_double),
            ("min_count_ratio_skip", ctypes.c_double),
            ("min_len_ldr", ctypes.c_uint8),
            ("min_len_inter_kmer", ctypes.c_uint8),
            ("max_len_kmer", ctypes.c_uint8),
            ("max_count_kmer", ctypes.c_uint8),
            ("min_depth_snp", ctypes.c_uint8),
            ("min_count_snp", ctypes.c_uint8),
            ("min_count_snp_link", ctypes.c_int8),
            ("ploidy", ctypes.c_double),
            ("indel_balance_factor_lgs", ctypes.c_double),
            ("max_indel_factor_lgs", ctypes.c_double),
            ("max_snp_factor_lgs", ctypes.c_double),
            ("min_snp_factor_sgs", ctypes.c_double),
            ("region_count", ctypes.c_int32),
            ("count_read_ins_sgs", ctypes.c_uint32),
            ("max_ins_len_sgs", ctypes.c_uint32),
            ("max_ins_fold_sgs", ctypes.c_int32),
            ("max_variant_count_lgs", ctypes.c_int32),
            ("max_clip_ratio_sgs", ctypes.c_double),
            ("max_clip_ratio_lgs", ctypes.c_double),
            ("trace_polish_open", ctypes.c_int32),
        ]

    cfgp = ref_lib.config_init(fa.encode(), bam.encode(), b"/nonexistent")
    cfg_struct = ctypes.cast(cfgp, ctypes.POINTER(_Cfg))
    cfg_struct.contents.trace_polish_open = 1
    res = ctypes.cast(ref_lib.score_chain(b"ctg1", cfgp),
                      ctypes.POINTER(PolishResult))
    n = res.contents.datalength
    ref_pts = [
        (res.contents.data[i].pos, res.contents.data[i].index,
         res.contents.data[i].curbase.decode(),
         res.contents.data[i].base.decode())
        for i in range(n)
    ]

    from nextpolish_tpu.models.score_chain import (
        AlgoConfig,
        score_chain_contig,
    )

    mycfg = AlgoConfig(trace_sink=[])
    out = score_chain_contig("ctg1", draft, batch, mycfg)
    assert out == ctypes.string_at(res.contents.contig)
    my_pts = [(p, j, c, b) for (_, p, j, c, b) in mycfg.trace_sink]
    ref_set = set(ref_pts)
    assert set(my_pts) == ref_set, (
        f"trace mismatch: ours-only={set(my_pts) - ref_set} "
        f"ref-only={ref_set - set(my_pts)}"
    )
    assert len(my_pts) > 0  # the planted edits must show up


def test_ctg_cns_multi_bam_merge_parity(ref2_lib, tmp_path):
    """>=2 sorted BAMs through our streaming heap-order merge vs the
    reference's bam_merge_iter (lib/bsort.c:1202-1463): consensus must be
    byte-identical — merge emission order fixes read order and hence the
    MSA insertion order the tie rules depend on."""
    from ref_parity import batch_to_bam, write_fai
    from ref_parity2 import run_reference_cns

    from util_sim import make_draft, rand_seq, records_to_batch, simulate_reads

    from nextpolish_tpu.io.bamregion import RegionFetcher
    from nextpolish_tpu.models.ctg_cns import ctg_cns_contig

    rng = np.random.default_rng(8)
    true = rand_seq(rng, 6000)
    draft, ops = make_draft(rng, true, n_edits=10)
    recs = simulate_reads(rng, true, ops, read_len=1800, step=131,
                          err_rate=0.04)
    batch = records_to_batch(recs, len(draft))
    fa = tmp_path / "genome.fa"
    fa.write_bytes(b">ctg1\n" + draft + b"\n")
    write_fai(str(fa))
    b1 = tmp_path / "l1.sort.bam"
    b2 = tmp_path / "l2.sort.bam"
    batch_to_bam(batch.select(np.arange(0, len(batch), 2)), str(b1))
    batch_to_bam(batch.select(np.arange(1, len(batch), 2)), str(b2))
    ref_out = run_reference_cns(ref2_lib, str(fa), [str(b1), str(b2)],
                                "ont")
    fetcher = RegionFetcher([str(b1), str(b2)])
    ours = ctg_cns_contig("ctg1", draft, fetcher, "ont")[0][1]
    fetcher.close()
    assert ours == ref_out["ctg1"][0]
