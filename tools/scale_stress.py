"""Scale stress of the O(window) task-1 data plane (VERDICT r4 #6).

Simulates an N-megabase multi-contig genome with paired short reads at
`depth`, writes real gzipped FASTQ inputs, and runs the FULL pipeline
(map -> markdup -> spill to sorted per-chunk BAMs -> region-merge
polish) with the spill plane FORCED ON, asserting the memory contract:
peak RSS (VmHWM) must stay bounded by the window working set, not by
the genome or read volume.

Emits one JSON line:
  {"genome_mb", "n_reads", "map_s", "polish_s", "vmhwm_mb",
   "markdup_removed", "out_bases", "ok"}

Usage: python tools/scale_stress.py [--mb 20] [--depth 12]
       [--budget-mb 6000]
(also reachable as `python bench.py --scale`).  Defaults are sized for
a 2-core dev rig (~10 min); on a production host raise --mb/--depth —
the VmHWM bound is the point, and it should NOT grow with --mb.
"""
from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vmhwm_mb() -> float:
    for line in open("/proc/self/status"):
        if line.startswith("VmHWM"):
            return int(line.split()[1]) / 1024.0
    return 0.0


def write_inputs(tmp, mb: float, depth: int, read_len=150, n_contigs=4,
                 seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    L = int(mb * 1e6 / n_contigs)
    ga = os.path.join(tmp, "genome.fa")
    r1 = os.path.join(tmp, "r1.fq.gz")
    r2 = os.path.join(tmp, "r2.fq.gz")
    n_pairs_total = 0
    with open(ga, "wb") as gf, \
            gzip.open(r1, "wb", compresslevel=1) as f1, \
            gzip.open(r2, "wb", compresslevel=1) as f2:
        for ci in range(n_contigs):
            true = rng.choice(bases, L)
            draft = true.copy()
            nm = max(L // 1000, 1)  # 0.1% draft errors to polish away
            mpos = rng.integers(0, L, nm)
            draft[mpos] = bases[(np.searchsorted(bases, draft[mpos]) + 1)
                                % 4]
            gf.write(b">ctg%d\n" % ci)
            gf.write(draft.tobytes() + b"\n")
            n_pairs = depth * L // (2 * read_len)
            starts = rng.integers(0, L - 400, n_pairs)
            qual = b"I" * read_len
            for pi in range(n_pairs):
                s = int(starts[pi])
                frag = true[s:s + 300]
                a = frag[:read_len]
                b = frag[-read_len:][::-1]
                b = bases[3 - np.searchsorted(bases, b)]  # revcomp
                nmark = b"@c%dp%d" % (ci, pi)
                f1.write(nmark + b"\n" + a.tobytes() + b"\n+\n"
                         + qual + b"\n")
                f2.write(nmark + b"\n" + b.tobytes() + b"\n+\n"
                         + qual + b"\n")
            n_pairs_total += n_pairs
    return ga, r1, r2, 2 * n_pairs_total


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=20.0)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--budget-mb", type=float, default=6000.0)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    os.environ["NPT_SPILL_BAM"] = "1"  # force the O(window) data plane
    tmp = tempfile.mkdtemp(prefix="npt_scale_")
    ga, r1, r2, n_reads = write_inputs(tmp, args.mb, args.depth)
    sgs_fofn = os.path.join(tmp, "sgs.fofn")
    with open(sgs_fofn, "w") as fh:
        fh.write(r1 + "\n" + r2 + "\n")
    cfgp = os.path.join(tmp, "run.cfg")
    with open(cfgp, "w") as fh:
        fh.write(f"""[General]
job_type = local
task = 1
rewrite = yes
genome = {ga}
workdir = {tmp}/rundir
parallel_jobs = 1
multithread_jobs = 2
[sgs_option]
sgs_fofn = {sgs_fofn}
sgs_options = -max_depth 100
""")
    from nextpolish_tpu.config import load_config
    from nextpolish_tpu.pipeline import Pipeline

    t0 = time.time()
    cfg = load_config(cfgp)
    pipe = Pipeline(cfg)
    pipe.run()
    wall = time.time() - t0
    out = os.path.join(cfg.workdir, "genome.nextpolish.fasta")
    out_bases = 0
    if os.path.exists(out):
        with open(out, "rb") as fh:
            out_bases = sum(len(line.strip()) for line in fh
                            if not line.startswith(b">"))
    hw = vmhwm_mb()
    ok = (out_bases > args.mb * 1e6 * 0.98) and hw < args.budget_mb
    print(json.dumps({
        "metric": "scale_stress_vmhwm_mb",
        "value": round(hw, 1),
        "unit": "MB",
        "genome_mb": args.mb,
        "n_reads": n_reads,
        "wall_s": round(wall, 1),
        "out_bases": out_bases,
        "budget_mb": args.budget_mb,
        "ok": bool(ok),
    }))
    if not args.keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
