"""Worker CLI + native library tests."""
import numpy as np
import pytest

from nextpolish_tpu.io import bam as bamio
from util_sim import make_draft, rand_seq, records_to_batch, simulate_reads


def _write_test_bam(tmp_path, rng, L=1200, n_edits=6):
    true = rand_seq(rng, L)
    draft, ops = make_draft(rng, true, n_edits=n_edits)
    recs = simulate_reads(rng, true, ops, read_len=100, step=3)
    bam = tmp_path / "sgs.sort.bam"
    hdr = bamio.BamHeader("", ["ctg1"], [len(draft)])
    bamio.write_bam(str(bam), hdr, sorted(recs, key=lambda r: r["pos"]))
    fa = tmp_path / "draft.fa"
    fa.write_bytes(b">ctg1\n" + draft + b"\n")
    return true, draft, str(fa), str(bam)


def test_native_matches_python(tmp_path):
    from nextpolish_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    true, draft, fa, bam = _write_test_bam(tmp_path, rng)
    from nextpolish_tpu.io.bam import _parse_records, read_bam
    from nextpolish_tpu.io.bgzf import decompress_stream

    b1 = read_bam(bam, with_names=True)  # native path
    data = decompress_stream(open(bam, "rb").read())
    import struct

    l_text = struct.unpack_from("<i", data, 4)[0]
    off = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4 + l_name + 4
    b2 = _parse_records(data, off, b1.header, True, True)
    assert np.array_equal(b1.pos, b2.pos)
    assert np.array_equal(b1.cigar, b2.cigar)
    assert np.array_equal(b1.seq, b2.seq)
    assert np.array_equal(b1.qual, b2.qual)
    assert np.array_equal(b1.flag, b2.flag)
    assert b1.names == b2.names
    assert np.array_equal(b1.tags, b2.tags)


def test_worker1_cli(tmp_path):
    from nextpolish_tpu.worker1 import main

    rng = np.random.default_rng(1)
    true, draft, fa, bam = _write_test_bam(tmp_path, rng)
    out = tmp_path / "out.fa"
    rc = main(["-g", fa, "-s", bam, "-t", "1", "-o", str(out)])
    assert rc == 0
    lines = out.read_bytes().split(b"\n")
    assert lines[0].startswith(b">ctg1 ")
    assert lines[1].upper() == true
    # resume: second run should keep output intact (ctg1 is the last record
    # so it is re-polished, same result)
    rc = main(["-g", fa, "-s", bam, "-t", "1", "-o", str(out)])
    assert out.read_bytes().split(b"\n")[1].upper() == true


def test_seq_stats(tmp_path):
    from nextpolish_tpu.io.seqstat import format_stats, seq_stats

    rng = np.random.default_rng(2)
    fq = tmp_path / "r.fa"
    with open(fq, "w") as fh:
        for i, ln in enumerate([1000, 2000, 3000, 4000]):
            fh.write(f">r{i}\n{'A' * ln}\n")
    st = seq_stats([str(fq)], genome_size=1000)
    assert st["count"] == 4
    assert st["total_bases"] == 10000
    assert st["N50"] == 3000
    assert st["raw_depth"] == 10.0
    assert "N50" in format_stats(st)
