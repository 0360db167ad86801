"""Task 3 — diploid SNP phasing (experimental in the reference,
lib/snpphase.c).  Implemented in models/snp_phase_impl once engine-2 pieces
land; the reference itself labels tasks 3/4 experimental (doc/FAQ.rst:24-27).
"""
from __future__ import annotations


def snp_phase_contig(name, draft, sgs_batch, lgs_batch, cfg):
    raise NotImplementedError(
        "task 3 (snp_phase) is not implemented yet in nextpolish_tpu"
    )
