"""Tasks 5/6 — long-read / HiFi window consensus (lib/ctg_cns.c).

Being built: align-tag MSA + second-order link DP on device, LQ-region POA
repair, window stitching.  See models/cns/ for the implementation pieces.
"""
from __future__ import annotations


def ctg_cns_contig(name, draft, batch, read_type, split=False):
    raise NotImplementedError(
        "tasks 5/6 (ctg_cns) are not implemented yet in nextpolish_tpu"
    )
