"""BP+OSD: batched device BP with host OSD fallback.

The drop-in role of ``ldpc.bposd_decoder`` (reference:
``misc/_experiment.py:2,23-40,77``): run BP; shots whose BP estimate already
reproduces the syndrome keep it, the (few) failed shots get OSD
post-processing on their BP soft output.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
from scipy import sparse

from .bp import BPDecoder
from .osd import osd_decode_batch

__all__ = ["BPOSDDecoder"]


@dataclass
class BPOSDDecoder:
    bp: BPDecoder
    H: sparse.csr_matrix
    osd_method: str = "osd_cs"
    osd_order: int = 7

    @classmethod
    def from_check_matrix(
        cls,
        H,
        *,
        error_rate: Optional[float] = None,
        channel_probs: Optional[np.ndarray] = None,
        max_iter: int = 0,
        bp_method: str = "ps",
        ms_scaling_factor: float = 0.0,
        osd_method: str = "osd_cs",
        osd_order: int = 7,
        qc_dims=None,
        qc_check_perm=None,
        qc_var_perm=None,
        **_ignored,
    ) -> "BPOSDDecoder":
        from .select import make_bp_decoder

        # QC codes route the BP stage to the roll kernel; its outputs come
        # back in ORIGINAL column order, so OSD runs on H unchanged
        bp = make_bp_decoder(
            H,
            error_rate=error_rate,
            channel_probs=channel_probs,
            max_iter=max_iter,
            bp_method=bp_method,
            ms_scaling_factor=ms_scaling_factor,
            qc_dims=qc_dims,
            qc_check_perm=qc_check_perm,
            qc_var_perm=qc_var_perm,
        )
        return cls(bp=bp, H=sparse.csr_matrix(H), osd_method=osd_method, osd_order=osd_order)

    def decode_batch(self, syndromes: np.ndarray) -> np.ndarray:
        """(S, C) syndromes -> (S, V) error estimates (BP, OSD on BP failures)."""
        syndromes = np.asarray(syndromes, dtype=np.uint8)
        hard, post, conv, _iters = self.bp.decode_batch(syndromes)
        hard = np.asarray(hard).copy()
        conv = np.asarray(conv)
        if not conv.all():
            failed = np.nonzero(~conv)[0]
            hard[failed] = osd_decode_batch(
                self.H,
                syndromes[failed],
                np.asarray(post)[failed],
                osd_method=self.osd_method,
                osd_order=self.osd_order,
            )
        return hard

    def decode(self, syndrome: np.ndarray) -> np.ndarray:
        return self.decode_batch(np.asarray(syndrome)[None, :])[0]
