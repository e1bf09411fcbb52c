"""Dantzig-style boxed LCP (reference: ODE `dSolveLCP`,
`dart/external/odelcpsolver/lcp.cpp` † — SURVEY.md §2.4/§7 "hardest port").

Status: the principal-pivoting kernel with a fixed pivot budget is planned
(Pallas); until it lands, this entry point runs a tighter PGS (more sweeps)
so `SolverConfig(solver="dantzig")` stays functional.  Complementarity
residuals are validated in tests either way.
"""
from __future__ import annotations

from dartenv_tpu.lcp.pgs import pgs_solve


def dantzig_solve(A, b, lo, hi, findex, mu, active, iters: int = 60):
    return pgs_solve(A, b, lo, hi, findex, mu, active, iters=iters)
