"""Quantum code file I/O — format-compatible with the reference.

Same DIMACS-inspired text format as ``/root/reference/python/qldpc/
quantum_code_io.py``: header ``qecc <n> <#X> <#Z> <#L>``, one row per
check/logical as ``<support...> X|Z|LX|LZ``, ``c``-prefixed comments.  Codes
written by the reference load here and vice versa.
"""
from __future__ import annotations

import numpy as np
from scipy import sparse

from ..core import QuantumCode, QuantumCodeChecks, QuantumCodeLogicals, make_check_matrix, num_rows

__all__ = ["read_quantum_code", "write_quantum_code"]


def read_quantum_code(stream, validate_stabilizer_code=None) -> QuantumCode:
    if validate_stabilizer_code is None:
        validate_stabilizer_code = True

    lines = [s.split() for s in stream.readlines() if s and s[0] != "c"]
    lines = [l for l in lines if len(l) > 0]

    if not lines or lines[0][0] != "qecc" or len(lines[0]) != 5:
        raise RuntimeError("Invalid header. Expected qecc <# qubits> <# X checks> <# Z checks> <# logicals>")

    qubit_count, x_check_count, z_check_count, logical_count = (int(v) for v in lines[0][1:5])
    check_count = x_check_count + z_check_count
    if check_count > qubit_count:
        raise RuntimeError(f"Code overconstrained. Got {check_count} checks on {qubit_count} qubits")

    rows = {"X": [], "Z": [], "LX": [], "LZ": []}
    for l in lines[1:]:
        support = [int(v) for v in l[:-1]]
        kind = l[-1]
        if kind not in rows:
            raise RuntimeError(f"Invalid check/logical type in line: \n {l}")
        if any(v >= qubit_count for v in support):
            raise RuntimeError(f"Out of bounds check support: \n {l}")
        rows[kind].append(support)

    if len(rows["X"]) + len(rows["Z"]) != check_count:
        raise RuntimeError(
            f"Number of checks does not match header. Expected {x_check_count} + {z_check_count}. "
            f'Got {len(rows["X"])} + {len(rows["Z"])}'
        )
    if len(rows["LZ"]) != len(rows["LX"]):
        raise RuntimeError(
            f'Number of X and Z logicals does not match: {len(rows["LX"])} X logicals and '
            f'{len(rows["LZ"])} Z logicals'
        )
    if len(rows["LZ"]) != logical_count:
        raise RuntimeError(
            f"Parsed number of logicals does not match header. Expected {logical_count}. "
            f'Got {len(rows["LZ"])}'
        )

    checks = QuantumCodeChecks(
        make_check_matrix(rows["X"], qubit_count), make_check_matrix(rows["Z"], qubit_count)
    )
    logicals = QuantumCodeLogicals(
        make_check_matrix(rows["LX"], qubit_count).toarray(),
        make_check_matrix(rows["LZ"], qubit_count).toarray(),
    )

    if validate_stabilizer_code:
        if not np.all((checks.x @ checks.z.transpose()).data % 2 == 0):
            raise RuntimeError("X and Z checks do not generate an abelian group")
        if logicals.num_logicals > 0:
            if not np.all((checks.x @ logicals.z.transpose()) % 2 == 0):
                raise RuntimeError("Z logicals do not commute with X checks")
            if not np.all((checks.z @ logicals.x.transpose()) % 2 == 0):
                raise RuntimeError("X logicals do not commute with Z checks")

    return QuantumCode(checks, logicals)


def write_quantum_code(stream, code: QuantumCode) -> None:
    stream.write(
        f"qecc {code.num_qubits} {num_rows(code.checks.x)} {num_rows(code.checks.z)} {code.num_logicals}\n"
    )
    for entry_type, matrix in (
        ("X", code.checks.x),
        ("Z", code.checks.z),
        ("LZ", code.logicals.z),
        ("LX", code.logicals.x),
    ):
        for row_index in range(num_rows(matrix)):
            if sparse.issparse(matrix):
                cols = sparse.find(matrix[[row_index], :])[1]
            else:
                cols = np.nonzero(matrix[row_index])[0]
            stream.write(f'{" ".join(str(c) for c in cols)} {entry_type}\n')
