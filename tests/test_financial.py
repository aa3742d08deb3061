"""Financial-modeling layer tests: risk metrics, portfolio optimization,
options pricing, and the GeospatialPortfolio wiring.

The reference imports this layer without shipping it (ref:
src/integrations/geo_financial/geo_risk.py:16-17); its intended method
surface comes from benchmark/configs/financial_modeling.yaml. These are
data-level tests against known closed forms (Black-Scholes, risk parity
stationarity, VaR of a known normal)."""
import numpy as np
import pytest

from njw_tpu.geofinancial import (
    GeospatialPortfolio, GeospatialRiskModel, SpatialRiskFactor,
    RiskMetricsAnalyzer, PortfolioOptimizer,
    historical_var, parametric_var, monte_carlo_var, cvar,
    sharpe_ratio, sortino_ratio, max_drawdown, risk_attribution,
    mean_variance_optimize, efficient_frontier, risk_parity,
    black_litterman, monte_carlo_simulation,
    black_scholes, greeks, binomial_tree, monte_carlo_price,
    barrier_option_price, asian_option_price,
)
from njw_tpu.geofinancial.risk_metrics import (
    _norm_ppf, covariance_matrix, volatility,
)
from njw_tpu.geofinancial.portfolio import project_to_simplex
from njw_tpu.geofinancial.testdata import generate_returns


def normal_returns(n_days=2000, mu=0.0005, sd=0.01, seed=3):
    return np.random.default_rng(seed).normal(mu, sd, n_days)


class TestRiskMetrics:
    def test_norm_ppf_matches_known_quantiles(self):
        assert _norm_ppf(0.975) == pytest.approx(1.959964, abs=1e-5)
        assert _norm_ppf(0.05) == pytest.approx(-1.644854, abs=1e-5)
        assert _norm_ppf(0.5) == pytest.approx(0.0, abs=1e-9)

    def test_historical_and_parametric_var_agree_on_gaussian(self):
        r = normal_returns()
        h = historical_var(r, 0.95)
        p = parametric_var(r, 0.95)
        # True 95% VaR of N(5e-4, 0.01) = -(mu - 1.645 sd) ~ 0.0159
        assert h == pytest.approx(0.0159, rel=0.12)
        assert p == pytest.approx(h, rel=0.1)

    def test_cvar_exceeds_var(self):
        r = normal_returns()
        assert cvar(r, 0.95) > historical_var(r, 0.95)

    def test_monte_carlo_var_matches_parametric(self):
        # 4 iid assets, equal weight: portfolio sd = sd/2.
        rng = np.random.default_rng(0)
        r = rng.normal(0.0, 0.01, (3000, 4))
        mc = monte_carlo_var(r, 0.95, n_samples=200_000)
        port = r.mean(axis=1)
        assert mc == pytest.approx(parametric_var(port, 0.95), rel=0.08)

    def test_mc_var_returns_cvar_pair(self):
        r = normal_returns()[:, None] * np.ones((1, 2))
        v, cv = monte_carlo_var(r, 0.95, n_samples=50_000,
                                return_cvar=True)
        assert cv > v > 0

    def test_sharpe_and_sortino(self):
        r = normal_returns(n_days=60_000, mu=0.001, sd=0.01)
        s = sharpe_ratio(r)
        assert s == pytest.approx(0.001 / 0.01 * np.sqrt(252), rel=0.25)
        assert sortino_ratio(r) > s  # downside dev < full sd for gaussian

    def test_max_drawdown_known_path(self):
        # +10%, -50%, +10%: trough = 0.55x peak -> dd = 0.45... exactly
        r = np.array([0.10, -0.50, 0.10])
        assert max_drawdown(r) == pytest.approx(0.50)

    def test_risk_attribution_sums_to_volatility(self):
        cov = np.array([[0.04, 0.01], [0.01, 0.09]])
        w = np.array([0.6, 0.4])
        att = risk_attribution(w, cov)
        assert att["contribution"].sum() == pytest.approx(
            att["volatility"])
        assert att["pct_contribution"].sum() == pytest.approx(1.0)

    def test_volatility_and_cov_shapes(self):
        r = generate_returns(5, 300, seed=1)
        assert covariance_matrix(r).shape == (5, 5)
        assert volatility(r).shape == (5,)
        assert np.isscalar(volatility(r[:, 0]))

    def test_analyzer_facade_methods(self):
        r = normal_returns()
        an = RiskMetricsAnalyzer()
        assert an.calculate_var(r, 0.95) == historical_var(r, 0.95)
        assert an.calculate_var(r, 0.95, "parametric") == \
            parametric_var(r, 0.95)
        assert an.calculate_cvar(r) == cvar(r)
        with pytest.raises(ValueError):
            an.calculate_var(r, 0.95, "nope")


class TestPortfolioOptimization:
    def cov2(self):
        return np.array([[0.04, 0.006], [0.006, 0.01]])

    def test_projection_properties(self):
        w = project_to_simplex(np.array([3.0, -1.0, 0.2]), 0.6)
        assert w.sum() == pytest.approx(1.0)
        assert (w >= -1e-12).all() and (w <= 0.6 + 1e-9).all()
        with pytest.raises(ValueError):
            project_to_simplex(np.ones(3), 0.2)  # 3*0.2 < 1

    def test_min_variance_prefers_low_vol_asset(self):
        res = mean_variance_optimize(np.array([0.0, 0.0]), self.cov2(),
                                     risk_aversion=1e6)
        # Analytic unconstrained min-var weights for this cov: solve
        # Sigma w = lam 1 -> w ~ [0.095, 0.905]
        assert res["weights"][1] > 0.85
        assert res["volatility"] == pytest.approx(
            np.sqrt(res["weights"] @ self.cov2() @ res["weights"]))

    def test_target_return_is_met(self):
        mu = np.array([0.10, 0.02])
        res = mean_variance_optimize(mu, self.cov2(), target_return=0.06)
        assert res["expected_return"] >= 0.06 - 1e-4
        # Must hold more of the high-return asset than min-var would.
        assert res["weights"][0] >= 0.49

    def test_max_weight_constraint_binds(self):
        mu = np.array([0.10, 0.02, 0.02])
        cov = np.diag([0.01, 0.01, 0.01])
        res = mean_variance_optimize(mu, cov, None, max_weight=0.5,
                                     risk_aversion=0.1)
        assert res["weights"][0] == pytest.approx(0.5, abs=1e-6)

    def test_efficient_frontier_monotone_vol(self):
        mu = np.array([0.02, 0.06, 0.10])
        cov = np.diag([0.01, 0.02, 0.05]) + 0.002
        ef = efficient_frontier(mu, cov, n_points=8)
        assert ef["volatilities"].shape == (8,)
        # Vol is non-decreasing along increasing target return.
        assert (np.diff(ef["volatilities"]) >= -1e-6).all()

    def test_risk_parity_equalizes_contributions(self):
        cov = np.array([[0.09, 0.009, 0.0],
                        [0.009, 0.01, 0.002],
                        [0.0, 0.002, 0.04]])
        rp = risk_parity(cov)
        c = rp["risk_contributions"]
        assert np.allclose(c, 1.0 / 3.0, atol=1e-4)
        assert rp["weights"].sum() == pytest.approx(1.0)

    def test_black_litterman_no_views_is_equilibrium(self):
        cov = self.cov2()
        w = np.array([0.5, 0.5])
        bl = black_litterman(w, cov)
        assert np.allclose(bl["posterior_returns"],
                           2.5 * cov @ w)

    def test_black_litterman_view_moves_posterior(self):
        cov = self.cov2()
        w = np.array([0.5, 0.5])
        pi = 2.5 * cov @ w
        # View: asset 0 returns 10% (well above equilibrium).
        bl = black_litterman(w, cov, views_P=[[1.0, 0.0]],
                             views_Q=[0.10])
        assert bl["posterior_returns"][0] > pi[0]

    def test_monte_carlo_simulation_stats(self):
        mu = np.array([0.0004, 0.0004])
        cov = 1e-4 * np.eye(2)
        sim = monte_carlo_simulation(np.array([0.5, 0.5]), mean=mu,
                                     cov=cov, n_paths=4000, horizon=252)
        assert sim["terminal_wealth"].shape == (4000,)
        # E[wealth] ~ exp(mu_p * 252) ~ 1.106
        assert sim["mean"] == pytest.approx(1.106, rel=0.05)
        assert 0.0 <= sim["prob_loss"] <= 1.0

    def test_optimizer_facade_matches_ref_call_shape(self):
        # The exact call the reference makes (ref: geo_risk.py:424).
        mu = np.array([0.08, 0.05, 0.03])
        cov = np.diag([0.04, 0.02, 0.01])
        res = PortfolioOptimizer().optimize(
            expected_returns=mu, cov_matrix=cov, target_return=0.05,
            constraints={"max_weight": 0.5})
        w = res.get("weights")
        assert w is not None and w.sum() == pytest.approx(1.0)
        assert (w <= 0.5 + 1e-9).all()


class TestOptionsPricing:
    # Canonical check values: S=100, K=100, T=1, r=5%, sigma=20%
    # BS call = 10.4506, put = 5.5735 (textbook values).
    def test_black_scholes_known_values(self):
        assert black_scholes(100, 100, 1.0, 0.05, 0.2) == pytest.approx(
            10.4506, abs=2e-3)
        assert black_scholes(100, 100, 1.0, 0.05, 0.2, "put") == \
            pytest.approx(5.5735, abs=2e-3)

    def test_put_call_parity_batched(self):
        s = np.array([80.0, 100.0, 120.0])
        c = black_scholes(s, 100, 0.5, 0.03, 0.25)
        p = black_scholes(s, 100, 0.5, 0.03, 0.25, "put")
        assert np.allclose(c - p, s - 100 * np.exp(-0.03 * 0.5),
                           atol=1e-3)

    def test_greeks_against_closed_form(self):
        g = greeks(100, 100, 1.0, 0.05, 0.2)
        # Closed-form: delta = N(d1) = 0.6368, gamma = 0.01876,
        # vega = 37.52, theta = -6.414, rho = 53.23.
        assert g["delta"] == pytest.approx(0.6368, abs=2e-3)
        assert g["gamma"] == pytest.approx(0.01876, abs=5e-4)
        assert g["vega"] == pytest.approx(37.52, rel=0.01)
        assert g["theta"] == pytest.approx(-6.414, rel=0.02)
        assert g["rho"] == pytest.approx(53.23, rel=0.01)

    def test_binomial_converges_to_black_scholes(self):
        bt = binomial_tree(100, 100, 1.0, 0.05, 0.2, n_steps=400)
        assert bt == pytest.approx(10.4506, rel=5e-3)

    def test_american_put_premium(self):
        eu = binomial_tree(100, 110, 1.0, 0.08, 0.2, kind="put",
                           n_steps=200)
        am = binomial_tree(100, 110, 1.0, 0.08, 0.2, kind="put",
                           n_steps=200, american=True)
        assert am > eu  # early exercise is worth something here

    def test_monte_carlo_matches_bs(self):
        mc = monte_carlo_price(100, 100, 1.0, 0.05, 0.2,
                               n_paths=200_000)
        assert mc["price"] == pytest.approx(10.4506,
                                            abs=4 * mc["stderr"] + 0.05)

    def test_barrier_bounded_by_vanilla(self):
        van = black_scholes(100, 100, 1.0, 0.05, 0.2)
        uo = barrier_option_price(100, 100, 130.0, 1.0, 0.05, 0.2,
                                  n_paths=20_000)
        assert 0.0 < uo["price"] < van
        assert 0.0 < uo["knock_prob"] < 1.0

    def test_asian_cheaper_than_vanilla_call(self):
        van = black_scholes(100, 100, 1.0, 0.05, 0.2)
        asian = asian_option_price(100, 100, 1.0, 0.05, 0.2,
                                   n_paths=20_000)
        assert 0.0 < asian["price"] < van  # averaging reduces vol


class TestGeoRiskWiring:
    def make_portfolio(self):
        rng = np.random.default_rng(7)
        p = GeospatialPortfolio()
        # Risky asset at low ground, safe at high ground; y ramps risk.
        risk_surface = np.tile(
            np.linspace(1.0, 0.0, 64)[:, None], (1, 64)).astype(
            np.float32)
        model = GeospatialRiskModel(
            [SpatialRiskFactor("elev", 1.0, risk_surface)])
        for i, (y, mu) in enumerate([(2.0, 0.0002), (60.0, 0.0006),
                                     (50.0, 0.0004)]):
            p.add_asset(f"a{i}", f"A{i}", 100.0 * (i + 1), 32.0, y,
                        {"asset_class": "default"},
                        returns=rng.normal(mu, 0.01, 300))
        return p, model

    def test_calculate_var_from_returns(self):
        p, _ = self.make_portfolio()
        v = p.calculate_var(0.95, lookback_days=252)
        assert 0.001 < v < 0.05

    def test_calculate_var_insufficient_history_raises(self):
        p, _ = self.make_portfolio()
        p.add_asset("short", "S", 10.0, 1.0, 1.0, returns=[0.01] * 10)
        with pytest.raises(ValueError, match="insufficient returns"):
            p.calculate_var(0.95, lookback_days=252)

    def test_optimize_for_geo_risk_excludes_risky(self):
        p, model = self.make_portfolio()
        w = p.optimize_for_geo_risk(model, target_return=0.0002,
                                    max_risk_score=0.5,
                                    lookback_days=252, max_weight=1.0)
        assert set(w) == {"a0", "a1", "a2"}
        assert w["a0"] == 0.0  # y=2 -> risk ~0.97 > 0.5, excluded
        assert sum(w.values()) == pytest.approx(1.0)

    def test_optimize_all_excluded_raises(self):
        p, model = self.make_portfolio()
        with pytest.raises(ValueError, match="no assets"):
            p.optimize_for_geo_risk(model, 0.0, max_risk_score=-1.0)
