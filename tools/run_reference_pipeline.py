#!/usr/bin/env python3
"""Run the REAL reference NextPolish pipeline on its bundled test_data.

Uses the oracle build in /tmp/refbuild (tools/build_ref_oracle.sh + the
bin/ copies) and the local paralleltask shim, producing the full workdir —
per-stage BAMs, per-stage input genomes, and the final polished FASTA —
for byte-parity verification against both the bundled expected outputs
(source/test_data/genome.nextpolish.fa) and this repo's engines.

Usage: python tools/run_reference_pipeline.py <workdir> [refbuild] [cfg]

Writes <workdir>/run.cfg (absolute paths) and runs `nextPolish run.cfg`.
Exit 0 on success; the final FASTA is <workdir>/rundir/genome.nextpolish.fasta.
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEST_DATA = "/root/reference/source/test_data"


def write_cfg(workdir: str, refbuild: str, base_cfg: str | None = None) -> str:
    """Translate the bundled run.cfg to absolute paths under `workdir`."""
    base_cfg = base_cfg or os.path.join(TEST_DATA, "run.cfg")
    lines = []
    for raw in open(base_cfg):
        line = raw.strip()
        if line.startswith("genome"):
            line = "genome = %s/raw.genome.fasta" % TEST_DATA
        elif line.startswith("workdir"):
            line = "workdir = %s/rundir" % workdir
        elif line.startswith("sgs_fofn"):
            line = "sgs_fofn = %s/sgs.fofn" % workdir
        elif line.startswith("lgs_fofn"):
            line = "lgs_fofn = %s/lgs.fofn" % workdir
        elif line.startswith("hifi_fofn"):
            line = "hifi_fofn = %s/hifi.fofn" % workdir
        elif line.startswith("deltmp"):
            # keep per-stage BAMs for parity checks; the line must be
            # DROPPED: config_parser only upgrades truthy values, so the
            # string 'no' would still satisfy `if cfg['deltmp']`
            continue
        lines.append(line)
    cfg = os.path.join(workdir, "run.cfg")
    with open(cfg, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    # fofns with absolute read paths
    for name, files in (("sgs", ["sreads.R1.fastq.gz", "sreads.R2.fastq.gz"]),
                        ("lgs", ["lreads.fasta.gz"]),
                        ("hifi", ["hifi.fasta.gz"])):
        with open(os.path.join(workdir, name + ".fofn"), "w") as fh:
            for f in files:
                fh.write(os.path.join(TEST_DATA, f) + "\n")
    return cfg


def run(workdir: str, refbuild: str = "/tmp/refbuild",
        base_cfg: str | None = None) -> str:
    os.makedirs(workdir, exist_ok=True)
    cfg = write_cfg(workdir, refbuild, base_cfg)
    env = dict(os.environ)
    shim = os.path.join(REPO, "tools", "paralleltask_shim")
    env["PYTHONPATH"] = shim + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    subprocess.run(
        [sys.executable, os.path.join(refbuild, "nextPolish"), cfg],
        check=True, cwd=workdir, env=env)
    out = os.path.join(workdir, "rundir", "genome.nextpolish.fasta")
    if not os.path.exists(out):
        raise RuntimeError("reference pipeline produced no output: " + out)
    return out


if __name__ == "__main__":
    wd = sys.argv[1]
    rb = sys.argv[2] if len(sys.argv) > 2 else "/tmp/refbuild"
    cfg = sys.argv[3] if len(sys.argv) > 3 else None
    print(run(wd, rb, cfg))
