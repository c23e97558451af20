"""Linear-stability and bifurcation analysis (beyond-reference capability).

The reference *hardcodes* its bifurcation structure: the plot scripts draw
the FHN Hopf line at beta=1 (util/FHNmodel/plot_FHNmodel_torus.py:93-95) and
the Goldbeter Hopf pair at beta=0.289 / 0.774
(util/GoldbeterModel/plot_GoldbeterModel_torus.py:91-94; the window is also
noted as a comment in data/GoldbeterModelArgs.ini:25) — numbers someone once
computed offline and typed in. This module computes them from the registered
kinetics themselves, via JAX automatic differentiation, for every model in
the registry:

  * ``kinetics_jacobian`` — forward-mode AD Jacobian of the 0-D kinetics
  * ``newton_fixed_point`` — damped Newton refinement of a fixed point
  * ``hopf_crossings`` — continuation scan of max Re(lambda(beta)) at the
    fixed point, bisection-refined crossings, classified Hopf vs real
  * ``dispersion_relation`` — growth rate lambda(k) of the
    reaction-diffusion linearisation J - k^2 D about a homogeneous state
  * ``turing_analysis`` / ``turing_threshold`` — diffusion-driven
    instability band and onset parameter

Eigenvalues are taken on the host (numpy): the matrices are nvars x nvars
(2-3 here) and this is setup/offline-scale analysis, not hot-path work. The
Jacobians come from ``jax.jacfwd`` so new model families get the whole
toolkit for free, with no hand-derivation.

Validated oracles (tests/test_stability.py): FHN Hopf at beta=1 exactly
(eigenvalues +-i*sqrt(eps)); Goldbeter window (0.28895, 0.77427) matching
the reference's hardcoded values; Brusselator Hopf at b=1+A^2 and Turing
onset at b_T=(1+A*sqrt(Du/Dv))^2 with critical wavenumber
k_c^2 = A/sqrt(Du*Dv) (all analytic).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Union

import numpy as np
import jax

from crdmodel_tpu.models.base import ReactionModel, get_model

ModelLike = Union[str, ReactionModel]


def _as_model(model: ModelLike) -> ReactionModel:
    return get_model(model) if isinstance(model, str) else model


def _kin0d(model: ReactionModel) -> Callable:
    """0-D kinetics f(y, beta) -> (nvars,), f64 on host for analysis grade."""
    kin = model.kinetics

    def f(y, beta):
        return kin(y, beta)

    return f


# jitted per-model residual/Jacobian caches: the scans below make thousands
# of tiny evaluations; eager dispatch would dominate their wall time
_RES_CACHE: dict = {}
_JAC_CACHE: dict = {}


def _residual_fn(model: ReactionModel) -> Callable:
    fn = _RES_CACHE.get(model.name)
    if fn is None:
        fn = jax.jit(_kin0d(model))
        _RES_CACHE[model.name] = fn
    return fn


def _jacobian_fn(model: ReactionModel) -> Callable:
    fn = _JAC_CACHE.get(model.name)
    if fn is None:
        fn = jax.jit(jax.jacfwd(_kin0d(model)))
        _JAC_CACHE[model.name] = fn
    return fn


def kinetics_jacobian(model: ModelLike, y, beta) -> np.ndarray:
    """(nvars, nvars) Jacobian d kinetics / d y at state ``y``, via jacfwd.

    Runs on CPU in the highest available precision (f64 when x64 is enabled,
    as it is for all analysis entry points below).
    """
    model = _as_model(model)
    y = np.asarray(y, dtype=np.float64)
    # analysis-grade f64 regardless of the process-wide dtype mode (TPU runs
    # are f32; jax.enable_x64 scopes double precision to this evaluation)
    with jax.enable_x64(), jax.default_device(jax.devices("cpu")[0]):
        J = _jacobian_fn(model)(y, np.float64(beta))
    return np.asarray(J, dtype=np.float64)


def newton_fixed_point(model: ModelLike, beta: float,
                       y0: Optional[Sequence[float]] = None,
                       tol: float = 1e-12, max_iter: int = 100) -> np.ndarray:
    """Damped-Newton solve of kinetics(y, beta) = 0.

    Starts from ``model.steady_state(beta)`` unless ``y0`` is given (models
    ship analytic/algebraic fixed points — src/FHNmodel_torus.cpp:242-244,
    models/goldbeter.py — so Newton is a refinement/verification here, and
    the generic solver for future models without one). Backtracking halves
    the step until the residual norm decreases.
    """
    model = _as_model(model)
    f = _residual_fn(model)
    y = np.asarray(model.steady_state(beta) if y0 is None else y0,
                   dtype=np.float64)
    with jax.enable_x64(), jax.default_device(jax.devices("cpu")[0]):
        for _ in range(max_iter):
            r = np.asarray(f(y, np.float64(beta)), dtype=np.float64)
            rn = float(np.linalg.norm(r))
            if rn < tol:
                return y
            J = kinetics_jacobian(model, y, beta)
            try:
                dy = np.linalg.solve(J, -r)
            except np.linalg.LinAlgError:
                raise RuntimeError(
                    f"singular kinetics Jacobian at beta={beta:g}, y={y}")
            lam = 1.0
            for _ in range(30):
                y_new = y + lam * dy
                rn_new = float(np.linalg.norm(
                    np.asarray(f(y_new, np.float64(beta)))))
                if rn_new < rn or rn_new < tol:
                    break
                lam *= 0.5
            y = y + lam * dy
        r = np.asarray(f(y, np.float64(beta)), dtype=np.float64)
    if float(np.linalg.norm(r)) > 1e3 * tol:
        raise RuntimeError(
            f"Newton failed to converge at beta={beta:g}: |f|={np.linalg.norm(r):.3e}")
    return y


def eigvals_at(model: ModelLike, beta: float,
               y: Optional[Sequence[float]] = None) -> np.ndarray:
    """Kinetics-Jacobian eigenvalues at the fixed point (or given state)."""
    model = _as_model(model)
    if y is None:
        y = newton_fixed_point(model, beta)
    return np.linalg.eigvals(kinetics_jacobian(model, y, beta))


def max_growth(model: ModelLike, beta: float,
               y: Optional[Sequence[float]] = None) -> float:
    """max Re(lambda) of the kinetics Jacobian at the fixed point."""
    return float(np.max(np.real(eigvals_at(model, beta, y))))


@dataclasses.dataclass(frozen=True)
class Crossing:
    """A stability boundary of the homogeneous fixed point."""
    beta: float          # parameter value where max Re(lambda) = 0
    kind: str            # "hopf" (complex pair) or "real" (real eigenvalue)
    omega: float         # |Im(lambda)| at the crossing (Hopf frequency; 0 for real)
    direction: str       # "destabilising" (Re increasing in beta) or "stabilising"


def hopf_crossings(model: ModelLike, beta_lo: float, beta_hi: float,
                   n_scan: int = 256, tol: float = 1e-9) -> List[Crossing]:
    """All stability crossings of the fixed point on [beta_lo, beta_hi].

    Continuation scan (each Newton warm-started from the previous beta's
    fixed point, so the same branch is tracked through the unstable window —
    the same object the reference hunts with backward-time integration,
    util/GoldbeterModel/SolveGoldbeterODE.py:59-67), then bisection on
    max Re(lambda) for each sign change.
    """
    model = _as_model(model)
    betas = np.linspace(beta_lo, beta_hi, n_scan)
    y = None
    fps, growths = [], []
    for b in betas:
        y = newton_fixed_point(model, float(b), y0=y)
        fps.append(y)
        growths.append(float(np.max(np.real(
            np.linalg.eigvals(kinetics_jacobian(model, y, b))))))
    growths = np.asarray(growths)

    out: List[Crossing] = []
    for i in range(n_scan - 1):
        g0, g1 = growths[i], growths[i + 1]
        if g0 == 0.0 or g0 * g1 >= 0.0:
            continue
        lo, hi = float(betas[i]), float(betas[i + 1])
        y_lo = fps[i]
        g_lo = g0
        while hi - lo > tol:
            mid = 0.5 * (lo + hi)
            y_mid = newton_fixed_point(model, mid, y0=y_lo)
            g_mid = float(np.max(np.real(
                np.linalg.eigvals(kinetics_jacobian(model, y_mid, mid)))))
            if (g_mid > 0.0) == (g_lo > 0.0):
                lo, y_lo, g_lo = mid, y_mid, g_mid
            else:
                hi = mid
        bc = 0.5 * (lo + hi)
        y_c = newton_fixed_point(model, bc, y0=y_lo)
        ev = np.linalg.eigvals(kinetics_jacobian(model, y_c, bc))
        lead = ev[np.argmax(np.real(ev))]
        kind = "hopf" if abs(np.imag(lead)) > 1e-8 else "real"
        out.append(Crossing(
            beta=bc, kind=kind, omega=abs(float(np.imag(lead))),
            direction="destabilising" if g1 > g0 else "stabilising"))
    return out


def diffusion_matrix(model: ModelLike, diffusion: float) -> np.ndarray:
    """Diagonal diffusion matrix D from the model's diffusive_vars/ratios
    (the same per-variable convention the RHS uses, core/problem.py)."""
    model = _as_model(model)
    D = np.zeros((model.nvars, model.nvars))
    for var, ratio in zip(model.diffusive_vars, model.diffusion_ratios):
        D[var, var] = diffusion * ratio
    return D


def dispersion_relation(model: ModelLike, beta: float, diffusion: float,
                        k, y: Optional[Sequence[float]] = None) -> np.ndarray:
    """Growth rate lambda_max(k) = max Re eig(J - k^2 D) per wavenumber.

    This is the linearisation of u_t = D lap(u) + f(u) about the homogeneous
    state in a Fourier mode e^{i k.x}: the flat-surface analysis is exact
    (periodic rectangle, SURVEY.md C6); on the torus it is the
    locally-uniform approximation (the metric modulates D with theta,
    src/FHNmodel_torus.cpp:527-541).
    """
    model = _as_model(model)
    if y is None:
        y = newton_fixed_point(model, beta)
    J = kinetics_jacobian(model, y, beta)
    D = diffusion_matrix(model, diffusion)
    k = np.atleast_1d(np.asarray(k, dtype=np.float64))
    out = np.empty(k.shape)
    for i, ki in enumerate(k.ravel()):
        out.ravel()[i] = float(np.max(np.real(
            np.linalg.eigvals(J - ki * ki * D))))
    return out


@dataclasses.dataclass(frozen=True)
class TuringBand:
    """Diffusion-driven instability band at fixed parameters."""
    k_lo: float          # band edges: lambda_max(k) > 0 for k in (k_lo, k_hi)
    k_hi: float
    k_peak: float        # fastest-growing wavenumber
    growth_peak: float   # lambda_max(k_peak)
    wavelength: float    # 2*pi/k_peak — the emergent pattern scale


def turing_analysis(model: ModelLike, beta: float, diffusion: float,
                    k_max: Optional[float] = None, n_k: int = 1024,
                    y: Optional[Sequence[float]] = None
                    ) -> Optional[TuringBand]:
    """Detect a Turing (diffusion-driven) instability; None if stable.

    Requires the homogeneous state stable to uniform perturbations
    (lambda_max(0) < 0) but unstable in a band of k — the classic
    pattern-formation criterion (Turing 1952), realised here by the
    fast-inhibitor families (models/brusselator.py, models/grayscott.py).
    """
    model = _as_model(model)
    if y is None:
        y = newton_fixed_point(model, beta)
    if max_growth(model, beta, y) >= 0.0:
        return None  # not Turing: already unstable at k=0
    if k_max is None:
        # beyond k^2 ~ 4*|J|/D_min every diffusing mode is damped past
        # any kinetics gain; scan to there
        J = kinetics_jacobian(model, y, beta)
        Dmin = min(diffusion * r for r in model.diffusion_ratios)
        k_max = 2.0 * np.sqrt(4.0 * np.max(np.abs(J)) / max(Dmin, 1e-300))
    ks = np.linspace(0.0, k_max, n_k)
    lam = dispersion_relation(model, beta, diffusion, ks, y=y)
    if np.max(lam) <= 0.0:
        return None
    i_peak = int(np.argmax(lam))

    def lam_at(k):
        return float(dispersion_relation(model, beta, diffusion, k, y=y)[0])

    def bisect_edge(k_neg, k_pos):
        for _ in range(80):
            mid = 0.5 * (k_neg + k_pos)
            if lam_at(mid) > 0.0:
                k_pos = mid
            else:
                k_neg = mid
        return 0.5 * (k_neg + k_pos)

    i_lo = i_peak
    while i_lo > 0 and lam[i_lo - 1] > 0.0:
        i_lo -= 1
    i_hi = i_peak
    while i_hi < n_k - 1 and lam[i_hi + 1] > 0.0:
        i_hi += 1
    k_lo = bisect_edge(ks[max(i_lo - 1, 0)], ks[i_lo]) if i_lo > 0 else 0.0
    k_hi = (bisect_edge(ks[min(i_hi + 1, n_k - 1)], ks[i_hi])
            if i_hi < n_k - 1 else ks[-1])
    # golden-section polish of the peak
    a, b = ks[max(i_peak - 1, 0)], ks[min(i_peak + 1, n_k - 1)]
    phi = 0.5 * (np.sqrt(5.0) - 1.0)
    c, d = b - phi * (b - a), a + phi * (b - a)
    fc, fd = lam_at(c), lam_at(d)
    for _ in range(60):
        if fc > fd:
            b, d, fd = d, c, fc
            c = b - phi * (b - a)
            fc = lam_at(c)
        else:
            a, c, fc = c, d, fd
            d = a + phi * (b - a)
            fd = lam_at(d)
    k_peak = 0.5 * (a + b)
    return TuringBand(k_lo=float(k_lo), k_hi=float(k_hi),
                      k_peak=float(k_peak), growth_peak=lam_at(k_peak),
                      wavelength=float(2.0 * np.pi / k_peak))


def turing_threshold(model: ModelLike, beta_lo: float, beta_hi: float,
                     diffusion: float, tol: float = 1e-8) -> float:
    """Onset parameter: smallest beta in [beta_lo, beta_hi] where a Turing
    band appears (bisection on max_k lambda(k); requires the band absent at
    beta_lo and present at beta_hi)."""
    model = _as_model(model)

    def has_band(b):
        return turing_analysis(model, b, diffusion) is not None

    if has_band(beta_lo):
        raise ValueError(f"Turing band already present at beta={beta_lo:g}")
    if not has_band(beta_hi):
        raise ValueError(f"no Turing band at beta={beta_hi:g}")
    lo, hi = float(beta_lo), float(beta_hi)
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        if has_band(mid):
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)


def stability_report(model: ModelLike, beta: float, diffusion: float,
                     beta_lo: Optional[float] = None,
                     beta_hi: Optional[float] = None) -> str:
    """Human-readable summary used by the CLI ``stability`` subcommand."""
    model = _as_model(model)
    lines = [f"model {model.name}: linear stability at beta={beta:g}, "
             f"D={diffusion:g}"]
    y = newton_fixed_point(model, beta)
    ev = eigvals_at(model, beta, y)
    fp = ", ".join(f"{n}={v:.10g}" for n, v in zip(model.var_names, y))
    lines.append(f"  fixed point: {fp}")
    lines.append("  eigenvalues: " + ", ".join(
        f"{e.real:+.6g}{e.imag:+.6g}j" for e in np.sort_complex(ev)[::-1]))
    g = float(np.max(np.real(ev)))
    lines.append(f"  homogeneous state: "
                 f"{'UNSTABLE (oscillatory/excited regime)' if g > 0 else 'stable'}"
                 f" (max Re = {g:+.6g})")
    band = turing_analysis(model, beta, diffusion)
    if band is not None:
        lines.append(
            f"  Turing band: k in ({band.k_lo:.6g}, {band.k_hi:.6g}), "
            f"fastest k={band.k_peak:.6g} (wavelength {band.wavelength:.6g}, "
            f"growth {band.growth_peak:.6g})")
    elif g < 0:
        lines.append("  Turing band: none (no diffusion-driven instability)")
    if beta_lo is not None and beta_hi is not None:
        cr = hopf_crossings(model, beta_lo, beta_hi)
        if cr:
            for c in cr:
                lines.append(
                    f"  crossing: beta={c.beta:.8g} [{c.kind}"
                    + (f", omega={c.omega:.6g}" if c.kind == "hopf" else "")
                    + f", {c.direction}]")
        else:
            lines.append(
                f"  crossing: none in [{beta_lo:g}, {beta_hi:g}]")
    return "\n".join(lines)
