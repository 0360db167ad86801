"""Task 4 — SNP re-validation (experimental, lib/snpvalid.c)."""
from __future__ import annotations


def snp_valid_contig(name, draft, sgs_batch, lgs_batch, cfg):
    raise NotImplementedError(
        "task 4 (snp_valid) is not implemented yet in nextpolish_tpu"
    )
