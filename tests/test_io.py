import gzip

import numpy as np

from nextpolish_tpu.io import bam as bamio
from nextpolish_tpu.io import bgzf
from nextpolish_tpu.io.fasta import FastaIndex, SeqRecord, read_fastx, write_fasta
from nextpolish_tpu.io.twobit import TwoBitGenome, pack, unpack


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    recs = [SeqRecord("a", b"ACGTacgt"), SeqRecord("b", b"TTTT", comment="c1")]
    write_fasta(str(p), recs)
    back = list(read_fastx(str(p)))
    assert [r.name for r in back] == ["a", "b"]
    assert back[0].seq == b"ACGTacgt"
    assert back[1].comment == "c1"
    assert back[0].lowercase_mask().tolist() == [False] * 4 + [True] * 4


def test_fastq_gz(tmp_path):
    p = tmp_path / "r.fq.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("@r1 extra\nACGT\n+\nIIII\n")
    recs = list(read_fastx(str(p)))
    assert recs[0].name == "r1"
    assert recs[0].qual == b"IIII"


def test_fasta_index(tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(">c1\nAAAA\nCCCC\n>c2\nGGGG\n")
    idx = FastaIndex(str(p))
    assert idx.names == ["c1", "c2"]
    assert idx.length("c1") == 8
    assert idx.fetch("c2").seq == b"GGGG"


def test_twobit_roundtrip():
    seq = b"ACGTACGTTGCA" * 7 + b"ACG"
    packed, n = pack(seq)
    assert unpack(packed, n) == seq
    assert unpack(packed, n, 3, 9) == seq[3:9]
    # reverse complement
    assert unpack(packed, n, 0, 4, rc=True) == b"ACGT"[::-1].translate(
        bytes.maketrans(b"ACGT", b"TGCA")
    )


def test_twobit_genome(tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(">c1\nACGTACGT\n>c2\nTTTTGGGG\n")
    g = TwoBitGenome.from_fasta(str(p))
    assert g.fetch("c1") == b"ACGTACGT"
    assert g.fetch("c2", 2, 6) == b"TTGG"
    assert g.fetch_codes("c1", 0, 4).tolist() == [0, 1, 2, 3]


def test_bgzf_roundtrip(tmp_path):
    p = tmp_path / "x.bgz"
    payload = b"hello bgzf " * 20000
    with bgzf.BgzfWriter(str(p)) as w:
        w.write(payload)
    assert bgzf.is_bgzf(str(p))
    assert bgzf.read_bgzf(str(p)) == payload


def _toy_records():
    return [
        dict(
            name="r1",
            flag=0,
            tid=0,
            pos=5,
            mapq=60,
            cigar=bamio.cigar_from_string("4M1I3M1D2M"),
            seq_nib=bamio.seq_to_nib(b"ACGTTACGGT"),
            qual=np.full(10, 30, np.uint8),
            mtid=-1,
            mpos=-1,
            tlen=0,
            tags=b"SAZchr1,100,+,10M,60,0;\x00",
        ),
        dict(
            name="r2",
            flag=bamio.FREVERSE,
            tid=0,
            pos=2,
            mapq=13,
            cigar=bamio.cigar_from_string("2S8M"),
            seq_nib=bamio.seq_to_nib(b"TTACGTACGT"),
            qual=np.full(10, 20, np.uint8),
            mtid=-1,
            mpos=-1,
            tlen=151,
        ),
    ]


def test_bam_roundtrip(tmp_path):
    p = tmp_path / "t.bam"
    hdr = bamio.BamHeader("@HD\tVN:1.6\n", ["c1"], [1000])
    bamio.write_bam(str(p), hdr, _toy_records())
    b = bamio.read_bam(str(p), with_names=True)
    assert len(b) == 2
    assert b.header.names == ["c1"]
    assert b.names == ["r1", "r2"]
    assert b.pos.tolist() == [5, 2]
    assert b.mapq.tolist() == [60, 13]
    assert bamio.cigar_to_string(b.rec_cigar(0)) == "4M1I3M1D2M"
    assert b.rec_seq_nib(1).tolist() == bamio.seq_to_nib(b"TTACGTACGT").tolist()
    assert b.ref_span().tolist() == [10, 8]
    left, right = b.soft_clip_lens()
    assert left.tolist() == [0, 2]
    assert right.tolist() == [0, 0]
    assert bamio.get_tag(b, 0, b"SA") == "chr1,100,+,10M,60,0;"
    assert bamio.get_tag(b, 1, b"SA") is None


def test_bam_select(tmp_path):
    p = tmp_path / "t.bam"
    hdr = bamio.BamHeader("", ["c1"], [1000])
    bamio.write_bam(str(p), hdr, _toy_records())
    b = bamio.read_bam(str(p), with_names=True)
    sub = b.select(b.mapq >= 60)
    assert len(sub) == 1
    assert sub.names == ["r1"]
    assert bamio.cigar_to_string(sub.rec_cigar(0)) == "4M1I3M1D2M"


def test_seq_count_cli(tmp_path, capsys):
    import gzip

    from nextpolish_tpu.seq_count import main as seq_count_main

    p = tmp_path / "r.fq.gz"
    with gzip.open(p, "wt") as fh:
        for i, ln in enumerate((500, 1500, 2500, 3500)):
            fh.write(f"@r{i}\n{'A' * ln}\n+\n{'I' * ln}\n")
    (tmp_path / "in.fofn").write_text("r.fq.gz\n")
    rc = seq_count_main(["-g", "1k", "-f", "1k", str(tmp_path / "in.fofn")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "N50" in out and "8000" in out  # total bases


def test_seq_split_cli(tmp_path, capsys):
    import gzip

    from nextpolish_tpu.io.fasta import read_fastx
    from nextpolish_tpu.seq_split import main as seq_split_main

    r1, r2 = tmp_path / "r1.fq.gz", tmp_path / "r2.fq.gz"
    for p, tag in ((r1, "a"), (r2, "b")):
        with gzip.open(p, "wt") as fh:
            for i in range(30):
                seq = "ACGT" * 40 if i % 10 else "ACGTN" * 32  # every 10th has N
                fh.write(f"@{tag}{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    (tmp_path / "in.fofn").write_text("r1.fq.gz\nr2.fq.gz\n")
    rc = seq_split_main(["-n", "3", "-d", str(tmp_path / "parts"),
                         "-p", "chunk", str(tmp_path / "in.fofn")])
    assert rc == 0
    outs = sorted((tmp_path / "parts").glob("chunk.*.fasta.gz"))
    assert len(outs) == 3
    reads = [r for p in outs for r in read_fastx(str(p))]
    # 30 pairs, 3 N-pairs dropped -> 54 reads, none with N, balanced parts
    assert len(reads) == 54
    assert not any(b"N" in r.seq for r in reads)
    sizes = [sum(len(r.seq) for r in read_fastx(str(p))) for p in outs]
    assert max(sizes) - min(sizes) <= 4 * 160
