"""Formal order-of-accuracy verification for every integrator.

Fixed-step integration of a smooth nonlinear ODE with exact solution;
halving h must reduce the global error by ~2^p.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from crdmodel_tpu.integrate.erk import TABLEAUS, make_erk_step
from crdmodel_tpu.integrate.rkc import make_rkc2_step_err

# logistic: y' = y (1 - y), y(0) = 0.1 -> y(t) = 1/(1 + 9 e^{-t})
Y0 = 0.1
T_END = 2.0


def exact(t):
    return 1.0 / (1.0 + 9.0 * np.exp(-t))


def _fixed_step_error(step_fn, n):
    h = jnp.float64(T_END / n)
    y = jnp.full((1,), Y0, jnp.float64)
    t = jnp.float64(0.0)
    for _ in range(n):
        y = step_fn(t, y, h)
        t = t + h
    return abs(float(y[0]) - exact(T_END))


@pytest.mark.parametrize("method,order", [
    ("bs32", 3), ("zonneveld43", 4), ("dopri54", 5),
])
def test_erk_order(method, order):
    rhs = lambda t, y, p: y * (1.0 - y)
    step = make_erk_step(TABLEAUS[method], rhs)

    def step_fn(t, y, h):
        y_new, _ = step(t, y, h, {})
        return y_new

    errs = [_fixed_step_error(step_fn, n) for n in (20, 40, 80)]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    for r in rates:
        assert r > order - 0.4, (method, errs, rates)


def test_rkc2_order():
    rhs = lambda t, y, p: y * (1.0 - y)
    rho = lambda t, y, p: jnp.asarray(2.0, y.dtype)
    step_err, init_carry = make_rkc2_step_err(rhs, rho, 1e-6, 1e-10)

    def step_fn(t, y, h):
        f0 = rhs(t, y, {})
        y_new, _, _ = step_err(t, y, h, {}, f0)
        return y_new

    errs = [_fixed_step_error(step_fn, n) for n in (20, 40, 80)]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    for r in rates:
        assert r > 1.6, (errs, rates)  # second order


def test_spatial_order_flat_laplacian():
    """Method-of-lines spatial convergence: second order on a smooth field
    away from the seam (the duplicated-point quirk is tested separately)."""
    from crdmodel_tpu.config import SimConfig
    from crdmodel_tpu.core.grid import make_geometry
    from crdmodel_tpu.ops.stencil import flat_laplacian
    errs = []
    for nx in (24, 48, 96):
        cfg = SimConfig(model="fhn", surface="flat", x_mesh=nx,
                        surface_width=2 * np.pi, surface_length=2 * np.pi,
                        dtype="float64")
        geom = make_geometry(cfg)
        x = cfg.xmin + np.arange(cfg.nx) * cfg.dx
        y = cfg.ymin + np.arange(cfg.ny) * cfg.dy
        X, Y = np.meshgrid(x, y)
        u = np.sin(2 * X) * np.sin(3 * Y)
        lap = np.asarray(flat_laplacian(
            jnp.asarray(u), geom.stencil_coeffs(jnp.float64)))
        want = cfg.diffusion * (-13.0) * u
        interior = (slice(2, -2), slice(2, -2))
        errs.append(np.max(np.abs(lap[interior] - want[interior])))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    for r in rates:
        assert r > 1.6, (errs, rates)
