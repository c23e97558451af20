"""Linear-stability toolkit vs the reference's hardcoded bifurcation lore.

The reference types its bifurcation structure in by hand; here every number
is COMPUTED from the registered kinetics via AD and checked against the
reference's values or analytic results:

  * FHN Hopf line at beta=1 — util/FHNmodel/plot_FHNmodel_torus.py:93-95
    draws it at exactly 1 (analytic: trace J = 3 - 3 beta^2 = 0).
  * Goldbeter oscillatory window 0.28895 < beta < 0.77427 —
    data/GoldbeterModelArgs.ini:25 (comment) and the hardcoded plot lines at
    0.289/0.774 (util/GoldbeterModel/plot_GoldbeterModel_torus.py:91-94).
  * Brusselator Hopf at b = 1 + A^2 and Turing onset at
    b_T = (1 + A sqrt(Du/Dv))^2 with k_c^2 = A/sqrt(Du Dv) (textbook).
"""

import numpy as np
import pytest

import crdmodel_tpu.models  # noqa: F401  (registers the model families)
from crdmodel_tpu.models import stability as st
from crdmodel_tpu.models.base import get_model
from crdmodel_tpu.models.goldbeter import OSC_BETA_MIN, OSC_BETA_MAX


class TestNewtonFixedPoint:
    def test_fhn_matches_analytic(self):
        y = st.newton_fixed_point("fhn", 0.5)
        np.testing.assert_allclose(y, [-0.5, 0.5 ** 3 - 1.5], atol=1e-12)

    def test_goldbeter_matches_algebraic(self):
        y = st.newton_fixed_point("goldbeter", 0.4)
        np.testing.assert_allclose(
            y, get_model("goldbeter").steady_state(0.4), rtol=1e-9)

    def test_converges_from_perturbed_init(self):
        exact = st.newton_fixed_point("brusselator", 1.5)
        y = st.newton_fixed_point("brusselator", 1.5,
                                  y0=exact + np.array([0.3, -0.2]))
        np.testing.assert_allclose(y, exact, atol=1e-10)

    def test_residual_is_zero(self):
        for name in ("fhn", "goldbeter", "brusselator", "sir"):
            y = st.newton_fixed_point(name, 0.4)
            model = get_model(name)
            r = np.asarray(model.kinetics(np.asarray(y), 0.4))
            assert np.linalg.norm(r) < 1e-10, name


class TestHopf:
    def test_fhn_hopf_at_beta_one(self):
        """Analytic: J = [[3-3b^2, -1], [eps, 0]], Hopf when trace=0 => b=1,
        omega = sqrt(det) = sqrt(eps) = 0.6. The reference plots this line
        hardcoded at beta=1 (util/FHNmodel/plot_FHNmodel_torus.py:93-95)."""
        cr = st.hopf_crossings("fhn", 0.2, 2.0)
        assert len(cr) == 1
        c = cr[0]
        assert c.kind == "hopf"
        assert abs(c.beta - 1.0) < 1e-6
        assert abs(c.omega - 0.6) < 1e-8
        assert c.direction == "stabilising"  # stable for beta > 1

    def test_goldbeter_window_matches_reference(self):
        """Computed window must match the reference's hardcoded
        0.28895/0.77427 (data/GoldbeterModelArgs.ini:25) and the module
        constants used for the backward-time rule."""
        cr = st.hopf_crossings("goldbeter", 0.05, 1.15, n_scan=128)
        assert [c.kind for c in cr] == ["hopf", "hopf"]
        lo, hi = cr[0].beta, cr[1].beta
        assert abs(lo - 0.28895) < 2e-4
        assert abs(hi - 0.77427) < 2e-4
        # the shipped constants round these to 3 decimals
        assert abs(lo - OSC_BETA_MIN) < 1e-3
        assert abs(hi - OSC_BETA_MAX) < 1e-3
        assert cr[0].direction == "destabilising"
        assert cr[1].direction == "stabilising"

    def test_brusselator_hopf_at_one_plus_a_squared(self):
        cr = st.hopf_crossings("brusselator", 1.9, 2.1, n_scan=32)
        assert len(cr) == 1
        assert cr[0].kind == "hopf"
        assert abs(cr[0].beta - 2.0) < 1e-6
        assert cr[0].direction == "destabilising"

    def test_eigenvalues_purely_imaginary_at_fhn_hopf(self):
        ev = st.eigvals_at("fhn", 1.0)
        np.testing.assert_allclose(np.real(ev), 0.0, atol=1e-12)
        np.testing.assert_allclose(sorted(np.imag(ev)), [-0.6, 0.6],
                                   atol=1e-12)


class TestDispersion:
    def test_k_zero_equals_kinetics_growth(self):
        lam0 = st.dispersion_relation("goldbeter", 0.4, 0.12, 0.0)[0]
        assert abs(lam0 - st.max_growth("goldbeter", 0.4)) < 1e-12

    def test_diffusion_matrix_follows_model_convention(self):
        D = st.diffusion_matrix("brusselator", 0.12)
        np.testing.assert_allclose(np.diag(D), [0.12, 0.96])
        D = st.diffusion_matrix("fhn", 0.12)
        np.testing.assert_allclose(np.diag(D), [0.12, 0.0])

    def test_fhn_stable_side_all_modes_damped(self):
        """FHN at beta=1.2 (stable side): every Fourier mode decays. Note
        lambda(k) is NOT monotone here — the non-diffusing variable's branch
        rises toward 0^- as k grows (J22 - J21*J12/(J11 - k^2 D) -> 0^-),
        which is why turing_analysis bisects band edges instead of assuming
        monotonicity."""
        ks = np.linspace(0.0, 10.0, 50)
        lam = st.dispersion_relation("fhn", 1.2, 0.12, ks)
        assert np.all(lam < 0.0)


class TestTuring:
    D = 0.12
    B_T = (1.0 + 1.0 / np.sqrt(8.0)) ** 2  # (1 + A sqrt(Du/Dv))^2, A=1

    def test_threshold_matches_analytic(self):
        bt = st.turing_threshold("brusselator", 1.5, 1.99, diffusion=self.D,
                                 tol=1e-6)
        assert abs(bt - self.B_T) < 5e-4

    def test_no_band_below_threshold(self):
        assert st.turing_analysis("brusselator", 1.7, self.D) is None

    def test_band_above_threshold_brackets_kc(self):
        """Just above onset the fastest mode sits at
        k_c = (A/sqrt(Du Dv))^(1/2)."""
        k_c = np.sqrt(1.0 / (self.D * np.sqrt(8.0)))
        band = st.turing_analysis("brusselator", self.B_T + 1e-3, self.D)
        assert band is not None
        assert abs(band.k_peak - k_c) / k_c < 0.01
        assert band.k_lo < k_c < band.k_hi
        assert band.growth_peak > 0.0
        assert abs(band.wavelength - 2 * np.pi / band.k_peak) < 1e-12

    def test_none_when_unstable_at_k_zero(self):
        """Not Turing if the homogeneous state is already unstable."""
        assert st.turing_analysis("brusselator", 2.05, self.D) is None

    def test_fhn_has_no_turing_band(self):
        """Single diffusing species with J22=0 cannot cross zero at k>0."""
        assert st.turing_analysis("fhn", 1.2, self.D) is None


class TestReport:
    def test_report_contains_key_lines(self):
        rep = st.stability_report("brusselator", 1.9, 0.12,
                                  beta_lo=1.9, beta_hi=2.1)
        assert "fixed point" in rep
        assert "Turing band" in rep
        assert "crossing: beta=2" in rep

    def test_report_oscillatory_regime(self):
        rep = st.stability_report("goldbeter", 0.4, 0.12)
        assert "UNSTABLE (oscillatory/excited regime)" in rep


@pytest.mark.parametrize("name", ["fhn", "goldbeter", "barkley", "sir",
                                  "brusselator", "grayscott", "oregonator",
                                  "lambdaomega"])
def test_jacobian_matches_finite_differences(name):
    """AD Jacobian vs central differences for every registered family."""
    model = get_model(name)
    try:
        y = st.newton_fixed_point(name, 0.45)
    except (RuntimeError, ValueError):
        y = np.asarray(model.steady_state(0.45), dtype=np.float64)
    J = st.kinetics_jacobian(name, y, 0.45)
    h = 1e-6
    for j in range(model.nvars):
        e = np.zeros(model.nvars)
        e[j] = h
        fp = np.asarray(model.kinetics(y + e, 0.45), dtype=np.float64)
        fm = np.asarray(model.kinetics(y - e, 0.45), dtype=np.float64)
        np.testing.assert_allclose(J[:, j], (fp - fm) / (2 * h),
                                   rtol=1e-5, atol=1e-6)
