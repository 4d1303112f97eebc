#!/usr/bin/env python
"""Pheno-noise p-sweep with the reference's 2/3*p priors
(reference: scripts/p_sweep.py:4-11)."""
from exp_ldpc_tpu.experiments.p_sweep import cli_main

if __name__ == "__main__":
    cli_main()
