"""Out-of-core data plane: BAI region reads, heap-order multi-BAM merge,
and bounded-RSS per-contig/per-window streaming equal to the in-memory
path byte for byte."""
import os
import subprocess
import sys

import numpy as np
import pytest

from nextpolish_tpu.io.bam import read_bam, write_bam
from nextpolish_tpu.io.bamregion import (
    IndexedBam,
    RegionFetcher,
    merge_region_batches,
)
from nextpolish_tpu.ops.pileup import region_overlap_mask
from util_sim import rand_seq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sim_bam(tmp_path, rng, n_contigs=3, L=40_000, depth=8, name="sim.bam",
             stride=1, offset=0):
    """Gapless simulated reads over random contigs, written sorted+indexed.
    stride/offset subsample reads (for multi-BAM merge tests)."""
    from nextpolish_tpu.io.bam import BamHeader
    from nextpolish_tpu.io.fasta import ASCII_TO_NIB

    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    names = [f"ctg{i}" for i in range(n_contigs)]
    header = BamHeader("", names, [L] * n_contigs)
    contigs = [rng.choice(bases, L) for _ in range(n_contigs)]
    recs = []
    rl = 150
    for tid, true in enumerate(contigs):
        per = depth * L // rl
        starts = np.sort(rng.integers(0, L - rl, per))
        seqs = true[starts[:, None] + np.arange(rl)[None, :]].copy()
        errs = rng.random(seqs.shape) < 0.01
        seqs[errs] = rng.choice(bases, int(errs.sum()))
        for j, s in enumerate(starts):
            recs.append(dict(
                name=f"r{tid}_{j}", flag=16 if j % 3 == 0 else 0, tid=tid,
                pos=int(s), mapq=60,
                cigar=np.array([(rl << 4)], dtype=np.uint32),
                seq_nib=ASCII_TO_NIB[seqs[j]],
                qual=np.full(rl, 35, np.uint8),
                mtid=-1, mpos=-1, tlen=300,
            ))
    recs = recs[offset::stride]
    path = str(tmp_path / name)
    write_bam(path, header, recs, index=True)
    return path, names, [c.tobytes() for c in contigs]


def test_region_fetch_matches_full(tmp_path):
    rng = np.random.default_rng(5)
    path, names, contigs = _sim_bam(tmp_path, rng)
    full = read_bam(path)
    with IndexedBam(path) as ib:
        assert ib.header.names == full.header.names
        for tid, (s, e) in [(0, (1000, 5000)), (1, (0, 39999)),
                            (2, (39000, 39999)), (1, (20000, 20000))]:
            reg = ib.fetch(tid, s, e)
            sub = full.select(region_overlap_mask(full, tid, s, e))
            assert np.array_equal(reg.pos, sub.pos)
            assert np.array_equal(reg.flag, sub.flag)
            for i in range(len(reg)):
                assert np.array_equal(reg.rec_seq_nib(i),
                                      sub.rec_seq_nib(i))
        head = ib.fetch_head(37)
        assert len(head) == 37
        assert np.array_equal(head.pos, full.pos[:37])


def test_merge_heap_order(tmp_path):
    """Two overlapping sorted BAMs merge in the reference heap's order:
    (tid, pos, reverse, file index, in-file order) — lib/bsort.c:174."""
    rng = np.random.default_rng(6)
    p1, _, _ = _sim_bam(tmp_path, rng, name="a.bam", stride=2, offset=0)
    rng = np.random.default_rng(6)
    p2, _, _ = _sim_bam(tmp_path, rng, name="b.bam", stride=2, offset=1)
    b1, b2 = read_bam(p1), read_bam(p2)
    m = merge_region_batches([b1, b2])
    assert len(m) == len(b1) + len(b2)
    key = list(zip(m.tid.tolist(), m.pos.tolist(),
                   ((m.flag & 16) != 0).tolist()))
    assert key == sorted(key)
    # full heap key incl. tie-breaks, brute-forced
    brute = sorted(
        [(int(b.tid[i]), int(b.pos[i]), bool(b.flag[i] & 16), fi, i)
         for fi, b in enumerate((b1, b2)) for i in range(len(b))])
    assert [x[:3] for x in brute] == key


def test_worker2_streaming_equals_memory(tmp_path):
    """ctg_cns through the RegionFetcher (per-window BAM reads) equals
    the in-memory whole-file path, including a 2-BAM merged source."""
    from nextpolish_tpu.models.ctg_cns import ctg_cns_contig
    from test_cns import _make_batch, _noisy
    from nextpolish_tpu.align.mapper import records_to_batch

    rng = np.random.default_rng(9)
    true = rand_seq(rng, 9000)
    draft = bytes(_noisy(rng, true, 0.01, 0.01, 0.01))
    batch, _ = _make_batch(rng, true, draft, n_reads=46, err=0.04)
    # write the mapped batch as two sorted BAMs (odd/even records)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from ref_parity import batch_to_bam

    p1 = str(tmp_path / "l1.bam")
    p2 = str(tmp_path / "l2.bam")
    batch_to_bam(batch.select(np.arange(0, len(batch), 2)), p1)
    batch_to_bam(batch.select(np.arange(1, len(batch), 2)), p2)
    fetcher = RegionFetcher([p1, p2])
    mem = merge_region_batches([read_bam(p1), read_bam(p2)])
    out_stream = ctg_cns_contig("ctg", draft, fetcher, "ont")
    out_mem = ctg_cns_contig("ctg", draft, mem, "ont")
    assert out_stream == out_mem
    assert len(out_stream[0][1]) > 8000
    fetcher.close()


def test_score_chain_streaming_equals_memory(tmp_path):
    from nextpolish_tpu.models.score_chain import (
        AlgoConfig,
        estimate_read_tlen,
        score_chain_pipeline,
    )

    rng = np.random.default_rng(11)
    path, names, contigs = _sim_bam(tmp_path, rng, n_contigs=2, L=20_000)
    full = read_bam(path)
    cfg = AlgoConfig()
    cfg.read_tlen = estimate_read_tlen(full, cfg)
    mem = dict(score_chain_pipeline(zip(names, contigs), full, cfg))
    with IndexedBam(path) as ib:
        cfg2 = AlgoConfig()
        cfg2.read_tlen = estimate_read_tlen(ib.fetch_head(10_000), cfg2)
        stream = dict(score_chain_pipeline(zip(names, contigs), ib, cfg2))
    assert mem == stream


@pytest.mark.slow
def test_streaming_bounds_memory(tmp_path):
    """Per-contig streaming holds peak RSS well below the in-memory path
    on a multi-contig genome (the O(window) data-plane claim)."""
    rng = np.random.default_rng(3)
    path, names, contigs = _sim_bam(tmp_path, rng, n_contigs=10,
                                    L=300_000, depth=10)
    fa = str(tmp_path / "genome.fa")
    with open(fa, "wb") as fh:
        for n, c in zip(names, contigs):
            fh.write(b">%s\n%s\n" % (n.encode(), c))

    prog = r"""
import sys, resource, json
import numpy as np
sys.path.insert(0, {repo!r})
from nextpolish_tpu.io.bam import read_bam
from nextpolish_tpu.io.bamregion import IndexedBam
from nextpolish_tpu.io.fasta import read_fastx
from nextpolish_tpu.models.score_chain import AlgoConfig, estimate_read_tlen, score_chain_pipeline
mode = sys.argv[1]
genome = [(r.name, r.seq) for r in read_fastx({fa!r})]
if mode == "stream":
    src = IndexedBam({bam!r})
    head = src.fetch_head(10000)
else:
    src = read_bam({bam!r})
    head = src
cfg = AlgoConfig(); cfg.read_tlen = estimate_read_tlen(head, cfg)
out = {{}}
for name, seq in score_chain_pipeline(genome, src, cfg):
    out[name] = len(seq)
# NOT ru_maxrss: with posix_spawn the child task inherits the parent's
# peak (a full pytest run reports its own ~GB for BOTH modes); VmHWM is
# per-mm and execve resets it
rss = 0
for line in open("/proc/self/status"):
    if line.startswith("VmHWM:"):
        rss = int(line.split()[1])
print(json.dumps({{"rss_kb": rss, "lens": out}}))
""".format(repo=REPO, fa=fa, bam=path)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    outs = {}
    for mode in ("stream", "memory"):
        r = subprocess.run([sys.executable, "-c", prog, mode],
                           capture_output=True, text=True, env=env,
                           timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        import json

        outs[mode] = json.loads(r.stdout.strip().splitlines()[-1])
    assert outs["stream"]["lens"] == outs["memory"]["lens"]
    # the streaming worker must not pay the whole-BAM footprint: the
    # 3 Mb x 10x case holds ~60 MB of read arrays in memory mode
    assert (outs["stream"]["rss_kb"]
            < outs["memory"]["rss_kb"] - 20_000), outs
