"""Steady states of the full 2-D PDE: matrix-free Newton-Krylov + Arnoldi.

The reference has no steady-state machinery beyond the 0-D popen bootstrap
(SURVEY.md §3.3); models/stability.py covers HOMOGENEOUS states. This
module handles PATTERNED ones — Turing spots/stripes, pinned waves:

  * solve_steady_state — damped Newton with matrix-free GMRES: the
    Jacobian-vector product is jax.jvp of the problem RHS (one extra RHS
    evaluation per Krylov vector, never a materialised matrix), so the
    whole solve runs on device at any grid size.
  * leading_eigenvalues — Arnoldi (scipy.sparse.linalg.eigs) on the same
    jitted jvp operator: linear stability of a patterned state, the 2-D
    generalisation of stability.py's dispersion relation.

The RHS is evaluated at a time past tBoundary (the freeze is a transient
device, src/FHNmodel_torus.cpp:643-653 — steady states live in the free
regime).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from crdmodel_tpu.core.problem import Problem


def _free_time(problem: Problem) -> float:
    """A time at which the RHS is autonomous-in-t for steady-state purposes
    (past the boundary freeze). Forced problems are rejected: F(y)=0 is
    ill-posed under time-dependent forcing."""
    if problem.forcing is not None:
        raise ValueError("steady states are ill-posed with time-dependent "
                         "forcing (problem.forcing is set)")
    return float(problem.cfg.t_boundary) + 1.0


def make_residual(problem: Problem):
    """Jitted F(y) = rhs(t_free, y, params) and its jvp v -> dF(y)[v]."""
    t = _free_time(problem)
    params = problem.params

    @jax.jit
    def F(y):
        return problem.rhs(t, y, params)

    @jax.jit
    def Jv(y, v):
        return jax.jvp(lambda z: problem.rhs(t, z, params), (y,), (v,))[1]

    return F, Jv


def solve_steady_state(problem: Problem, y0=None, tol: float = 1e-8,
                       max_newton: int = 40, gmres_tol: float = 1e-3,
                       gmres_restart: int = 40, gmres_maxiter: int = 4,
                       verbose: bool = False):
    """Damped Newton-GMRES solve of rhs(y) = 0.

    y0: initial iterate (defaults to problem.y0 — in practice pass a
    near-steady snapshot, e.g. the last frame of a simulation, and Newton
    polishes it to machine-precision stationarity). tol is on the RMS
    residual |F|/sqrt(N). The linear solves are inexact (gmres_tol forcing
    term) with backtracking on |F| — standard inexact-Newton globalisation.
    Returns (y, info dict with converged/iterations/residual_rms).

    On periodic domains patterned states carry translational zero modes;
    inexact GMRES handles the resulting near-singularity by reducing the
    residual in the range space (the translation component of the update is
    irrelevant to stationarity).
    """
    F, Jv = make_residual(problem)
    y = jnp.asarray(problem.y0 if y0 is None else y0)
    sqrt_n = float(np.sqrt(y.size))

    def rms(r):
        return float(jnp.linalg.norm(r.ravel())) / sqrt_n

    r = F(y)
    rn = rms(r)
    info = {"converged": False, "iterations": 0, "residual_rms": rn,
            "history": [rn]}
    for it in range(max_newton):
        if rn < tol:
            info["converged"] = True
            break
        A = lambda v, y=y: Jv(y, v)
        dy, _ = jax.scipy.sparse.linalg.gmres(
            A, -r, tol=gmres_tol, atol=0.0,
            restart=gmres_restart, maxiter=gmres_maxiter)
        lam = 1.0
        accepted = False
        for _ in range(25):
            y_try = y + lam * dy
            r_try = F(y_try)
            rn_try = rms(r_try)
            if np.isfinite(rn_try) and rn_try < rn:
                accepted = True
                break
            lam *= 0.5
        if not accepted:
            break  # stagnated: return best iterate with converged=False
        y, r, rn = y_try, r_try, rn_try
        info["iterations"] = it + 1
        info["residual_rms"] = rn
        info["history"].append(rn)
        if verbose:
            print(f"newton {it + 1}: |F|_rms = {rn:.3e} (lambda={lam:g})")
    info["converged"] = bool(rn < tol)
    info["residual_rms"] = rn
    return y, info


def leading_eigenvalues(problem: Problem, y, k: int = 6,
                        which: str = "LR", tol: float = 1e-7,
                        maxiter: Optional[int] = None) -> np.ndarray:
    """Leading eigenvalues of the full 2-D Jacobian at state y, by Arnoldi
    iteration on the matrix-free jvp (scipy.sparse.linalg.eigs; each matvec
    is one jitted device RHS-jvp). which="LR" (largest real part) answers
    the stability question: max Re < 0 means the patterned state is
    linearly stable. Host orchestration, device matvecs — analysis-scale
    tooling like models/stability.py."""
    from scipy.sparse.linalg import LinearOperator, eigs
    _, Jv = make_residual(problem)
    y = jnp.asarray(y)
    shape = y.shape
    n = int(y.size)
    dtype = np.asarray(y).dtype

    def matvec(v):
        vj = jnp.asarray(np.asarray(v, dtype=dtype).reshape(shape))
        return np.asarray(Jv(y, vj)).ravel()

    A = LinearOperator((n, n), matvec=matvec, dtype=dtype)
    vals = eigs(A, k=k, which=which, tol=tol, maxiter=maxiter,
                return_eigenvectors=False)
    return np.sort_complex(vals)[::-1]


def is_linearly_stable(problem: Problem, y, k: int = 6,
                       margin: float = 1e-6) -> bool:
    """True when the k leading-real-part eigenvalues at y all satisfy
    Re(lambda) < margin (margin absorbs the translational zero modes of
    periodic patterns, which sit at Re = 0 to solver tolerance)."""
    vals = leading_eigenvalues(problem, y, k=k)
    return bool(np.max(np.real(vals)) < margin)
