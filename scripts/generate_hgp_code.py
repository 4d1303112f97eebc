#!/usr/bin/env python
"""CLI wrapper (reference: scripts/generate_hgp_code.py)."""
from exp_ldpc_tpu.experiments.generate_hgp import main

if __name__ == "__main__":
    main()
