"""Synthetic R1CS instances for benchmarking and scale testing.

The reference caps out at ~20 constraints (int64 factorial overflow in its
Lagrange basis, r1csqap.go:129-147) and its largest exercised workload is the
7-constraint cubic (SURVEY §6).  BASELINE.json's benchmark tiers need
2^14..2^22-constraint instances; this module generates satisfiable R1CS
systems of arbitrary power-of-two size directly in sparse form, with
witnesses, without going through the flat-code DSL.

Shape: a multiplication chain  s_{k+1} = s_k * s_{k-1}  (mod r) with one
public output — every constraint row has O(1) nonzeros, like real circuits.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

from .bn128.constants import R as FR_MOD

__all__ = ["SparseR1CS", "mul_chain_r1cs"]

_NATIVE_FR = None


def _native_fr():
    global _NATIVE_FR
    if _NATIVE_FR is None:
        from . import native

        _NATIVE_FR = native.NativeField(FR_MOD)
    return _NATIVE_FR


@dataclass
class SparseR1CS:
    """Sparse constraint system over Fr.

    rows are dicts {signal_index: coeff}; signal 0 is the constant one.
    Layout mirrors the reference: [one, publics..., privates/intermediates].
    """

    n_constraints: int
    n_signals: int
    n_public: int
    A: List[Dict[int, int]] = field(default_factory=list)
    B: List[Dict[int, int]] = field(default_factory=list)
    C: List[Dict[int, int]] = field(default_factory=list)
    witness: List[int] = field(default_factory=list)

    @classmethod
    def from_circuit(cls, circuit, witness=None, r: int = FR_MOD) -> "SparseR1CS":
        """Bridge from a DSL-compiled :class:`..circuitcompiler.Circuit` to
        the sparse form the TPU fast prover consumes — this is what lets
        flat-code circuits (cli `compile`) run through FastGroth16 instead
        of the O(n^2) monomial parity path (cli/main.go:455-505 analog).

        If the circuit's dense R1CS has been generated it is consumed as
        before; otherwise rows come straight from
        ``Circuit.generate_r1cs_sparse`` — O(nnz) end to end, which is what
        makes 2^16+-constraint DSL circuits feasible (the dense form needs
        n_constraints x n_signals cells; the reference caps out around 20
        constraints for other reasons, circuit.go:84-148).

        The witness may be the raw-integer reference witness; it is reduced
        mod r here (the fast path is field-semantics end to end)."""
        w = witness if witness is not None else circuit.witness
        if circuit.r1cs.A:
            rows = lambda dense: [
                {i: c % r for i, c in enumerate(row) if c % r} for row in dense
            ]
            A, B, C = (
                rows(circuit.r1cs.A),
                rows(circuit.r1cs.B),
                rows(circuit.r1cs.C),
            )
        else:
            sa, sb, sc = circuit.generate_r1cs_sparse()
            srows = lambda rs: [
                {i: c % r for i, c in row.items() if c % r} for row in rs
            ]
            A, B, C = srows(sa), srows(sb), srows(sc)
        sys_ = cls(
            n_constraints=len(A),
            n_signals=circuit.n_signals,
            n_public=circuit.n_public,
            A=A,
            B=B,
            C=C,
            witness=[x % r for x in w],
        )
        return sys_

    def check(self, r: int = FR_MOD) -> bool:
        w = self.witness
        dot = lambda row: sum(c * w[i] for i, c in row.items()) % r
        return all(
            dot(a) * dot(b) % r == dot(c)
            for a, b, c in zip(self.A, self.B, self.C)
        )

    def row_evals(self, r: int = FR_MOD) -> Tuple[List[int], List[int], List[int]]:
        """Witness-combined evaluations per constraint: (a_j, b_j, c_j) with
        a_j = <A_j, w> etc. — the evaluation-form inputs of the fast prover.
        Uses the native C++ sparse matvec when built."""
        try:
            from . import native

            if r == FR_MOD and native.available():
                import numpy as np

                nf = _native_fr()
                out = []
                for rows in (self.A, self.B, self.C):
                    indptr, cols, vals = [0], [], []
                    for row in rows:
                        for i, v in row.items():
                            cols.append(i)
                            vals.append(v)
                        indptr.append(len(cols))
                    out.append(
                        nf.sparse_matvec(
                            np.asarray(indptr, dtype=np.int64),
                            np.asarray(cols, dtype=np.int64),
                            np.asarray(vals, dtype=np.int64),
                            self.witness,
                        )
                    )
                return tuple(out)  # type: ignore[return-value]
        except Exception:
            pass
        w = self.witness
        dot = lambda row: sum(c * w[i] for i, c in row.items()) % r
        return (
            [dot(row) for row in self.A],
            [dot(row) for row in self.B],
            [dot(row) for row in self.C],
        )


def mul_chain_r1cs(n_constraints: int, seed: int = 0) -> SparseR1CS:
    """A satisfiable chain:  s_{k+1} = s_k * s_{k-1}  over Fr.

    Signals: [one, out(public), s_1, s_2, ..., s_{n+1}] where the last chain
    value is constrained equal to the public output by the final constraint
    (out * 1 = s_last)."""
    r = FR_MOD
    rng = random.Random(seed)
    s1, s2 = rng.randrange(2, r), rng.randrange(2, r)
    sys_ = SparseR1CS(
        n_constraints=n_constraints,
        n_signals=n_constraints + 3,
        n_public=1,
    )
    # witness: [one, out, s1, s2, s3, ...]
    chain = [s1, s2]
    for _ in range(n_constraints - 1):
        chain.append(chain[-1] * chain[-2] % r)
    out = chain[-1]
    sys_.witness = [1, out] + chain
    # chain constraints: chain[k+1] = chain[k] * chain[k-1]
    # signal index of chain[k] is 2 + k
    for k in range(n_constraints - 1):
        sys_.A.append({2 + k + 1: 1})
        sys_.B.append({2 + k: 1})
        sys_.C.append({2 + k + 2: 1})
    # output binding: out * 1 = chain[-1]
    sys_.A.append({1: 1})
    sys_.B.append({0: 1})
    sys_.C.append({2 + len(chain) - 1: 1})
    assert len(sys_.A) == n_constraints
    return sys_
