"""Tasks 5/6 — long-read (lgs_polish) / HiFi (hifi_polish) consensus.

Entry point over the window engine in models/cns/ (ctg_cns_core,
lib/ctg_cns.c:3399-3623).  Emits (name, sequence) parts; contig splitting
(-sp with structural split points) is not active yet — the structural layer
only engages for contigs > 100 kb in the reference and is scheduled for a
later round, so every contig yields one part.
"""
from __future__ import annotations

from .cns.window import consensus_for_contig

READ_TYPES = {"ont", "clr", "hifi", "rs"}


def ctg_cns_contig(name: str, draft: bytes, batch, read_type: str,
                   split: bool = False, window: int = 5_000_000,
                   min_cov: int = 4):
    if read_type not in READ_TYPES:
        raise ValueError(f"unknown read type {read_type!r}")
    tid = batch.header.name2id(name)
    if tid < 0:
        return [(name, draft)]
    seq = consensus_for_contig(batch, tid, draft, read_type, window=window,
                               min_cov=min_cov)
    if len(seq) <= 10:
        # the reference hard-errors on tiny outputs (lib/nextpolish2.py:
        # 195-202); keep the draft instead and let the caller log it
        return [(name, draft)]
    return [(name, seq)]
