import pytest

from nextpolish_tpu.config import expand_tasks, load_config, parse_config_text


def test_parse_config_text():
    cfg = parse_config_text(
        """
# comment
[general]
job_type = local
task= best
genome : ./raw.fa  # trailing comment
empty =
"""
    )
    assert cfg["job_type"] == "local"
    assert cfg["task"] == "best"
    assert cfg["genome"] == "./raw.fa"
    assert "empty" not in cfg


def test_expand_tasks_aliases():
    assert expand_tasks("best", True, True, True) == [5, 5, 6, 6, 1, 2, 1, 2]
    assert expand_tasks("default", True, True, True) == [5, 6, 1, 2]
    assert expand_tasks("all", True, True, True) == [5, 6, 1, 2, 3, 4]


def test_expand_tasks_pruning():
    # no sgs -> drop 1,2,3,4 ; no hifi -> drop 6
    assert expand_tasks("best", False, True, False) == [5, 5]
    assert expand_tasks("default", True, False, False) == [1, 2]


def test_expand_tasks_ordering():
    with pytest.raises(ValueError):
        expand_tasks("21", True, True, True)
    with 0 if False else pytest.raises(ValueError):
        expand_tasks("13", True, True, True)


def test_load_config(tmp_path):
    genome = tmp_path / "g.fa"
    genome.write_text(">a\n" + "ACGT" * 100 + "\n")
    sgs = tmp_path / "sgs.fofn"
    sgs.write_text("reads.fq\n")
    cfgfile = tmp_path / "run.cfg"
    cfgfile.write_text(
        f"""
task = 12
genome = {genome}
sgs_fofn = {sgs}
workdir = ./work
sgs_options = -max_depth 50
parallel_jobs = 4
"""
    )
    cfg = load_config(str(cfgfile))
    assert cfg.task == [1, 2]
    assert cfg.genome_size == 400
    assert cfg.sgs_max_depth == 50
    assert cfg.workdir == str(tmp_path / "work")
    assert cfg.parallel_jobs == 4
