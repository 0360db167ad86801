"""Reads-axis psum pileup merge (the production multi-chip task-1 path):
byte-equality of score_chain_contig_sharded / the multichip router vs the
single-chip engine on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

from nextpolish_tpu.models.score_chain import (
    AlgoConfig,
    score_chain_contig,
    score_chain_contig_sharded,
    score_chain_pipeline_multichip,
)
from util_sim import random_messy_records, records_to_batch


def _mesh(n):
    import jax

    from nextpolish_tpu.parallel.shard import reads_mesh

    if len(jax.devices()) < n:
        pytest.skip("needs the virtual multi-device mesh")
    return reads_mesh(n)


def _case(seed, L=4000, n_reads=400):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    draft = rng.choice(bases, L).tobytes()
    recs = random_messy_records(rng, L, n_reads=n_reads)
    return draft, records_to_batch(recs, L)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_contig_byte_equal(n_dev):
    mesh = _mesh(n_dev)
    draft, batch = _case(0)
    cfg = AlgoConfig()
    want = score_chain_contig("ctg1", draft, batch, cfg)
    got = score_chain_contig_sharded("ctg1", draft, batch, cfg, mesh)
    assert got == want


def test_sharded_windowed_byte_equal(monkeypatch):
    """Force multi-window processing (tiny window) — the forward-state
    chaining + backward traceback stitch must still be byte-exact."""
    import nextpolish_tpu.models.score_chain as sc

    mesh = _mesh(4)
    draft, batch = _case(1, L=6000, n_reads=500)
    cfg = AlgoConfig()
    want = score_chain_contig("ctg1", draft, batch, cfg)
    monkeypatch.setattr(sc, "SHARD_WINDOW_CELLS", 2048)
    got = score_chain_contig_sharded("ctg1", draft, batch, cfg, mesh)
    assert got == want


def test_multichip_router_routes_big_contigs():
    """The production router (what polish_task calls): big contigs go
    through the sharded collective, small ones through the pipeline —
    outputs byte-equal to the single-chip engine either way."""
    mesh = _mesh(4)
    cfg = AlgoConfig()
    d1, b1 = _case(2, L=5000, n_reads=400)
    pairs = [("ctg1", d1)]
    want = [(n, score_chain_contig(n, s, b1, cfg)) for n, s in pairs]
    got = list(score_chain_pipeline_multichip(pairs, b1, cfg, mesh=mesh,
                                              shard_min=1000))
    assert got == want
    # below the threshold the same call takes the pipelined path
    got2 = list(score_chain_pipeline_multichip(pairs, b1, cfg, mesh=mesh,
                                               shard_min=10 ** 9))
    assert got2 == want
