import gzip

import pytest

from nextpolish_tpu.kit import (
    cal_n50_info,
    calgs,
    parse_num_unit,
    parse_options_value,
    remove_option,
)


def test_parse_num_unit():
    assert parse_num_unit("2.3 kb") == 2300
    assert parse_num_unit("500M") == 500_000_000
    assert parse_num_unit("1g") == 1_000_000_000
    assert parse_num_unit(42) == 42
    assert parse_num_unit("100") == 100
    with pytest.raises(ValueError):
        parse_num_unit("12 parsecs")


def test_parse_options_value():
    assert parse_options_value("-x map-ont -t 5", "-t") == "5"
    assert parse_options_value("-max_depth 100", "-max_depth") == "100"
    with pytest.raises(ValueError):
        parse_options_value("-a 1", "-b")


def test_remove_option():
    assert remove_option("-a 1 -b 2", "-a") == "-b 2"
    assert remove_option("-a 1 -flag -b 2", "-flag", has_value=False) == "-a 1 -b 2"


def test_cal_n50_info():
    text = cal_n50_info([100, 200, 300, 400])
    assert "N50" in text
    assert "Total" in text
    assert "1000" in text


def test_calgs_fasta(tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(">a\nACGT\nACGT\n>b\nAC\n")
    assert calgs(str(p)) == 10


def test_calgs_fastq_gz(tmp_path):
    p = tmp_path / "r.fq.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("@r1\nACGTACGT\n+\nIIIIIIII\n@r2\nAC\n+\nII\n")
    assert calgs(str(p)) == 10
