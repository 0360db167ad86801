"""Pipeline driver tests: config -> rounds -> gather, with resume."""
import gzip
import os

import numpy as np

from nextpolish_tpu.config import load_config
from nextpolish_tpu.pipeline import Pipeline, read_polished_names
from util_sim import rand_seq, make_draft

_COMP = bytes.maketrans(b"ACGT", b"TGCA")


def _make_project(tmp_path, rng, L=6000, n_edits=10, depth=40):
    true = rand_seq(rng, L)
    draft, _ = make_draft(rng, true, n_edits=n_edits)
    (tmp_path / "draft.fa").write_bytes(b">ctg1 x\n" + draft + b"\n")
    r1, r2 = [], []
    n_pairs = depth * L // 300
    for i in range(n_pairs):
        p = int(rng.integers(0, L - 400))
        a = true[p : p + 150]
        b = true[p + 250 : p + 400].translate(_COMP)[::-1]
        r1.append((f"p{i}", a))
        r2.append((f"p{i}", b))
    for fn, reads in (("r1.fq.gz", r1), ("r2.fq.gz", r2)):
        with gzip.open(tmp_path / fn, "wt") as fh:
            for name, seq in reads:
                fh.write(f"@{name}\n{seq.decode()}\n+\n{'I' * len(seq)}\n")
    (tmp_path / "sgs.fofn").write_text("r1.fq.gz\nr2.fq.gz\n")
    (tmp_path / "run.cfg").write_text(
        f"""
task = 12
genome = ./draft.fa
sgs_fofn = ./sgs.fofn
workdir = ./work
parallel_jobs = 2
multithread_jobs = 2
"""
    )
    return true


def test_pipeline_end_to_end(tmp_path):
    rng = np.random.default_rng(21)
    true = _make_project(tmp_path, rng)
    cfg = load_config(str(tmp_path / "run.cfg"))
    asm = Pipeline(cfg).run()
    assert os.path.exists(asm)
    assert os.path.exists(asm + ".stat")
    out = open(asm, "rb").read().split(b"\n")[1]
    # interior fully corrected
    assert out.upper()[40:-40] in true
    # resume: a second run skips all stages and produces a versioned output
    asm2 = Pipeline(cfg).run()
    assert asm2.endswith("genome.nextpolish.v1.fasta")


def test_read_polished_names(tmp_path):
    f = tmp_path / "part.fa"
    f.write_bytes(b">a 4\nACGT\n>b 4\nCCCC\n>c 4\nGG")  # c truncated
    names = read_polished_names(str(f))
    assert names == {"a", "b"}
    # file truncated back to before c
    assert f.read_bytes() == b">a 4\nACGT\n>b 4\nCCCC\n"
