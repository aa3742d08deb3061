"""Geo-financial integration tests (mirrors ref
tests/integrations/geo_financial/ coverage: risk factors, aggregation,
climate risk, scenarios, multi-region, streams)."""
import time

import numpy as np
import pytest

from njw_tpu.geofinancial import (
    AggregationMethod, ClimateHazardType, ClimateRiskAssessor,
    ClimateScenario, DataStreamSource, GeospatialEventStream,
    GeospatialPortfolio, GeospatialRiskModel, MarketDataStream,
    MultiRegionRiskModel, RegionDefinition, RegionalRiskComparator,
    RiskAggregator, RiskSurfaceGenerator, Scenario, ScenarioAnalyzer,
    ScenarioSet, SpatialRiskFactor, TPUOptimizer, TimeHorizon,
    create_climate_scenarios, create_economic_scenarios,
    create_elevation_risk_factor, create_flood_risk_factor,
    create_sea_level_rise_factor, create_slope_risk_factor,
    create_stress_scenarios,
)
from njw_tpu.geofinancial.multiregion import make_region_grid


def dem64():
    yy, xx = np.mgrid[0:64, 0:64] / 64
    return (30 * yy + 5 * np.sin(6 * xx)).astype(np.float32)  # slopes up in y


def portfolio():
    """Assets: low-elevation (risky) at small y, high ground at large y."""
    p = GeospatialPortfolio()
    p.add_asset("low1", "Low 1", 100.0, 32.0, 5.0,
                {"asset_class": "real_estate", "carbon_intensity": 0.8})
    p.add_asset("low2", "Low 2", 200.0, 10.0, 8.0,
                {"asset_class": "coastal", "carbon_intensity": 0.2})
    p.add_asset("high1", "High 1", 150.0, 40.0, 60.0,
                {"asset_class": "default", "carbon_intensity": 0.1})
    return p


class TestRiskFactors:
    def test_elevation_factor_orders_assets(self):
        rf = create_elevation_risk_factor(dem64())
        model = GeospatialRiskModel([rf])
        risks = portfolio().assess_risk(model)
        assert risks["low1"] > risks["high1"]
        assert 0.0 <= min(risks.values()) and max(risks.values()) <= 1.0

    def test_slope_and_flood_factors_build(self):
        for rf in (create_slope_risk_factor(dem64()),
                   create_flood_risk_factor(dem64(), n_iterations=32)):
            assert rf.risk_data.shape == (64, 64)
            assert 0.0 <= rf.risk_data.min() and rf.risk_data.max() <= 1.0

    def test_weighted_combination(self):
        flat = SpatialRiskFactor("a", 1.0, np.full((8, 8), 0.2))
        hot = SpatialRiskFactor("b", 3.0, np.full((8, 8), 1.0))
        model = GeospatialRiskModel([flat, hot])
        r = model.assess_risk(np.asarray([4.0]), np.asarray([4.0]))
        assert r[0] == pytest.approx((0.2 + 3.0) / 4.0, abs=1e-5)

    def test_value_at_risk_and_expected_loss(self):
        rf = create_elevation_risk_factor(dem64())
        model = GeospatialRiskModel([rf])
        p = portfolio()
        var = p.value_at_risk(model, threshold=0.5)
        el = p.expected_loss(model)
        assert 0 <= var <= p.total_value
        assert 0 <= el <= p.total_value


class TestAggregation:
    RISKS = np.asarray([[0.2, 0.8], [0.4, 0.6], [0.0, 1.0]])

    @pytest.mark.parametrize("method", list(AggregationMethod))
    def test_methods_bounded(self, method):
        agg = RiskAggregator(method)
        out = agg.aggregate(self.RISKS)
        assert out.shape == (2,)
        assert (out >= 0).all() and (out <= 1).all()

    def test_maximum_dominates_average(self):
        avg = RiskAggregator(AggregationMethod.WEIGHTED_AVERAGE).aggregate(
            self.RISKS)
        mx = RiskAggregator(AggregationMethod.MAXIMUM).aggregate(self.RISKS)
        assert (mx >= avg - 1e-12).all()

    def test_product_method(self):
        out = RiskAggregator(AggregationMethod.PRODUCT).aggregate(
            np.asarray([[0.5], [0.5]]))
        assert out[0] == pytest.approx(0.75)

    def test_correlation_matrix(self):
        C = RiskAggregator.correlation_matrix(np.random.default_rng(0)
                                              .uniform(size=(3, 50)))
        assert C.shape == (3, 3)
        np.testing.assert_allclose(np.diag(C), 1.0)

    def test_surface_interpolates_toward_points(self):
        gen = RiskSurfaceGenerator()
        surf = gen.generate([10.0, 50.0], [10.0, 50.0], [0.0, 1.0],
                            (32, 32), (0, 64, 0, 64))
        # near the risky point the surface is high, near the safe one low
        assert surf[25, 25] > 0.8 and surf[5, 5] < 0.2


class TestClimate:
    def _assessor(self):
        a = ClimateRiskAssessor(ClimateScenario.PESSIMISTIC,
                                TimeHorizon.LONG)
        a.add_hazard(ClimateHazardType.SEA_LEVEL_RISE,
                     create_sea_level_rise_factor(dem64(), rise_m=2.0))
        return a

    def test_physical_risk_scaled_by_scenario(self):
        p = portfolio()
        pess = self._assessor().physical_risk(p)
        opt = ClimateRiskAssessor(ClimateScenario.OPTIMISTIC,
                                  TimeHorizon.SHORT)
        opt.add_hazard(ClimateHazardType.SEA_LEVEL_RISE,
                       create_sea_level_rise_factor(dem64(), rise_m=2.0))
        opti = opt.physical_risk(p)
        assert pess["low1"] >= opti["low1"]

    def test_transition_risk_uses_carbon_intensity(self):
        t = self._assessor().transition_risk(portfolio())
        assert t["low1"] > t["high1"]  # carbon 0.8 vs 0.1

    def test_combined_and_expected_loss(self):
        a = self._assessor()
        p = portfolio()
        combined = a.combined_risk(p)
        assert set(combined) == {"low1", "low2", "high1"}
        assert 0 <= a.expected_portfolio_loss(p) <= p.total_value


class TestScenarios:
    def _analyzer(self):
        model = GeospatialRiskModel([create_elevation_risk_factor(dem64())])
        return ScenarioAnalyzer(portfolio(), model)

    def test_multiplier_increases_loss(self):
        an = self._analyzer()
        base = an.evaluate(Scenario("base"))
        hot = an.evaluate(Scenario("hot",
                                   risk_multipliers={"elevation_risk": 2.0}))
        assert hot["total_loss"] >= base["total_loss"]

    def test_value_shock_applies_to_class(self):
        an = self._analyzer()
        shocked = an.evaluate(Scenario("re", value_shocks={"real_estate": 0.5}))
        base = an.evaluate(Scenario("base"))
        assert shocked["total_loss"] > base["total_loss"]

    def test_factory_sets_and_var(self):
        an = self._analyzer()
        for sset in (create_climate_scenarios(), create_economic_scenarios(),
                     create_stress_scenarios()):
            res = an.evaluate_set(sset)
            assert res["expected_loss"] >= 0
            assert res["worst_loss"] >= res["expected_loss"] - 1e-9
        v = an.var(create_economic_scenarios(), 0.95)
        assert v >= 0


class TestMultiRegion:
    def test_assess_and_rank(self):
        model = GeospatialRiskModel([create_elevation_risk_factor(dem64())])
        mr = MultiRegionRiskModel()
        south = RegionDefinition("south", 0, 64, 0, 32)
        north = RegionDefinition("north", 0, 64, 32, 64)
        mr.add_region(south, model).add_region(north, model)
        summary = mr.assess(portfolio())
        assert summary["south"]["n_assets"] == 2
        assert summary["north"]["n_assets"] == 1
        ranked = RegionalRiskComparator(mr).rank(portfolio())
        assert ranked[0][0] == "south"  # low ground = high risk

    def test_region_grid(self):
        grid = make_region_grid(0, 100, 0, 100, 2, 2)
        assert len(grid) == 4
        assert grid[0].contains(10, 10)


class TestRealtime:
    def test_market_stream_delivers_prices(self):
        got = []
        stream = MarketDataStream(["AAA", "BBB"], interval_s=0.02)
        stream.subscribe(lambda p: got.append(p))
        stream.start()
        time.sleep(0.15)
        stream.stop()
        assert not stream.running
        assert len(got) >= 2
        assert set(got[0]["prices"]) == {"AAA", "BBB"}

    def test_event_stream_and_bad_subscriber_isolated(self):
        got = []
        stream = GeospatialEventStream(interval_s=0.02, event_rate=2.0)
        stream.subscribe(lambda p: (_ for _ in ()).throw(RuntimeError()))
        stream.subscribe(lambda p: got.append(p))
        stream.start()
        time.sleep(0.12)
        stream.stop()
        assert len(got) >= 2  # bad subscriber did not kill the stream
        assert all("events" in p for p in got)


class TestOptimizer:
    def test_batch_and_tile_sizes_aligned(self):
        opt = TPUOptimizer()
        bs = opt.optimal_batch_size(1024)
        assert bs % 128 == 0 and bs >= 128
        assert opt.optimal_tile_size(512 * 512) % 128 == 0

    def test_batched_assessment_matches_direct(self):
        model = GeospatialRiskModel([create_elevation_risk_factor(dem64())])
        p = portfolio()
        direct = p.assess_risk(model)
        batched = TPUOptimizer().batched_risk_assessment(p, model,
                                                         batch_size=2)
        for k in direct:
            assert batched[k] == pytest.approx(direct[k], abs=1e-6)

    def test_benchmark_metrics(self):
        model = GeospatialRiskModel([create_elevation_risk_factor(dem64())])
        m = TPUOptimizer().benchmark(portfolio(), model, n_repeats=1)
        assert m["assets"] == 3 and m["assets_per_second"] > 0


class TestDataConnectors:
    """Data layer (ref: data_connectors.py:25-313 roles)."""

    def test_asset_csv_roundtrip(self, tmp_path):
        from njw_tpu.geofinancial.data import AssetLocationDataLoader
        from njw_tpu.geofinancial.testdata import generate_assets

        port = generate_assets(12, extent=100.0, seed=3)
        p = AssetLocationDataLoader.save_asset_csv(
            port, str(tmp_path / "assets.csv"))
        back = AssetLocationDataLoader.load_asset_csv(p)
        assert len(back.assets) == 12
        assert back.total_value == pytest.approx(port.total_value, rel=1e-6)

    def test_asset_geojson(self, tmp_path):
        import json as _json

        from njw_tpu.geofinancial.data import (
            AssetLocationDataLoader, export_portfolio_geojson,
        )
        from njw_tpu.geofinancial.testdata import generate_assets

        port = generate_assets(5, extent=50.0, seed=4)
        p = export_portfolio_geojson(port, str(tmp_path / "a.geojson"))
        doc = _json.load(open(p))
        assert doc["type"] == "FeatureCollection"
        back = AssetLocationDataLoader.load_asset_geojson(p)
        assert len(back.assets) == 5

    def test_returns_csv_and_attach(self, tmp_path):
        from njw_tpu.geofinancial.data import FinancialDataLoader
        from njw_tpu.geofinancial.testdata import generate_dataset

        files = generate_dataset(str(tmp_path), size=32, n_assets=6,
                                 n_days=30, seed=5)
        returns = FinancialDataLoader.load_returns_csv(files["returns"])
        assert len(returns) == 6
        assert next(iter(returns.values())).shape == (30,)

        from njw_tpu.geofinancial.data import AssetLocationDataLoader

        port = AssetLocationDataLoader.load_asset_csv(files["assets"])
        n = FinancialDataLoader.attach_returns_to_assets(port, returns)
        assert n == 6
        assert "volatility" in port.assets[0].metadata

    def test_returns_from_prices(self):
        from njw_tpu.geofinancial.data import FinancialDataLoader

        prices = np.array([100.0, 110.0, 99.0])
        r = FinancialDataLoader.calculate_returns_from_prices(prices)
        np.testing.assert_allclose(r, [0.1, -0.1], atol=1e-6)
        rl = FinancialDataLoader.calculate_returns_from_prices(
            prices, log_returns=True)
        np.testing.assert_allclose(rl, np.log([1.1, 0.9]), atol=1e-6)

    def test_dem_npz_risk_factor(self, tmp_path):
        from njw_tpu.geofinancial.data import GeoRiskDataLoader
        from njw_tpu.geofinancial.testdata import generate_dem

        dem = generate_dem(32, seed=6)
        p = GeoRiskDataLoader.save_dem(str(tmp_path / "dem.npz"), dem)
        back, t = GeoRiskDataLoader.load_dem(p)
        np.testing.assert_allclose(back, dem)
        rf = GeoRiskDataLoader.load_raster_as_risk_factor(
            p, "flood", invert=True)
        assert rf.risk_data.min() >= 0.0 and rf.risk_data.max() <= 1.0
        # inverted: low elevation -> high risk
        lo = np.unravel_index(np.argmin(dem), dem.shape)
        assert rf.risk_data[lo] > 0.9


class TestTestDataGenerator:
    """ref: generate_test_data.py:34-412 roles."""

    def test_assets_clustered_and_seeded(self):
        from njw_tpu.geofinancial.testdata import generate_assets

        a = generate_assets(30, extent=200.0, n_clusters=3, seed=7)
        b = generate_assets(30, extent=200.0, n_clusters=3, seed=7)
        assert [x.value for x in a.assets] == [x.value for x in b.assets]
        clusters = {x.metadata["cluster"] for x in a.assets}
        assert len(clusters) <= 3

    def test_returns_shape_and_correlation(self):
        from njw_tpu.geofinancial.testdata import generate_returns

        r = generate_returns(8, 500, market_beta=0.9, seed=8)
        assert r.shape == (500, 8)
        c = np.corrcoef(r.T)
        off_diag = c[~np.eye(8, dtype=bool)]
        assert off_diag.mean() > 0.5  # strong one-factor structure

    def test_price_series(self):
        from njw_tpu.geofinancial.testdata import (
            generate_price_series, generate_returns,
        )

        r = generate_returns(2, 10, seed=9)
        p = generate_price_series(r, p0=50.0)
        assert p.shape == (11, 2)
        np.testing.assert_allclose(p[0], 50.0)
        np.testing.assert_allclose(p[1], 50.0 * (1 + r[0]), rtol=1e-5)

    def test_cli_writes_dataset(self, tmp_path):
        from njw_tpu.geofinancial.testdata import main

        assert main(["--out", str(tmp_path / "d"), "--size", "32",
                     "--assets", "4", "--days", "5"]) == 0
        import os

        assert os.path.exists(tmp_path / "d" / "assets.csv")


class TestScenarioAnalysisLayer:
    """Data-level analysis methods (ref: scenario_analysis.py:587
    compare_scenarios, :796 perform_sensitivity_analysis, :877
    perform_stress_test, :999 export_results)."""

    def _analyzer(self):
        model = GeospatialRiskModel(
            [create_elevation_risk_factor(dem64())])
        return ScenarioAnalyzer(portfolio(), model)

    def test_analyze_scenario_caches_and_structures(self):
        an = self._analyzer()
        res = an.analyze_scenario(Scenario("base"))
        assert "base" in an.scenario_results
        assert set(res["statistics"]) >= {
            "mean", "std", "min", "max", "value_weighted_risk"}
        assert res["economic_impact"]["el_ratio"] <= 1.0
        assert len(res["asset_risks"]) == 3

    def test_compare_scenarios_deltas(self):
        an = self._analyzer()
        an.analyze_scenario(Scenario("base"))
        an.analyze_scenario(Scenario(
            "hot", risk_multipliers={"elevation_risk": 2.0}))
        cmp_ = an.compare_scenarios(["base", "hot"], "base")
        row = cmp_["statistics_comparison"]["hot"]["mean"]
        assert row["abs_diff"] >= 0  # doubling risk can't reduce mean
        assert row["scenario"] == pytest.approx(
            row["baseline"] + row["abs_diff"])
        econ = cmp_["economic_comparison"]["hot"]["expected_loss"]
        assert econ["scenario"] >= econ["baseline"]

    def test_compare_unanalyzed_raises(self):
        an = self._analyzer()
        with pytest.raises(ValueError, match="not been analyzed"):
            an.compare_scenarios(["nope"])

    def test_sensitivity_curve_monotone(self):
        an = self._analyzer()
        sens = an.perform_sensitivity_analysis(
            "elevation_risk", [0.5, 1.0, 1.5, 2.0])
        assert len(sens["expected_losses"]) == 4
        assert (np.diff(sens["expected_losses"]) >= -1e-9).all()
        assert sens["comparison"]["baseline"] == sens["scenarios"][0]

    def test_stress_test_with_combinations(self):
        an = self._analyzer()
        flood = Scenario("flood",
                         risk_multipliers={"elevation_risk": 1.5})
        crash = Scenario("crash", value_shocks={"default": 0.2,
                                                "real_estate": 0.3,
                                                "coastal": 0.2})
        st = an.perform_stress_test([flood, crash],
                                    combination_levels=2)
        assert st["combinations"] == ["combo_flood_crash"]
        m = st["metrics"]
        # Combination is at least as severe as each component.
        assert m["combo_flood_crash"]["expected_loss"] >= \
            max(m["flood"]["expected_loss"],
                m["crash"]["expected_loss"]) - 1e-9
        assert m["baseline"]["expected_loss"] <= \
            m["flood"]["expected_loss"] + 1e-9

    def test_combine_scenarios_composition_rules(self):
        a = Scenario("a", risk_multipliers={"f": 1.5},
                     value_shocks={"c": 0.5})
        b = Scenario("b", risk_multipliers={"f": 2.0},
                     value_shocks={"c": 0.5})
        c = ScenarioAnalyzer.combine_scenarios([a, b])
        assert c.risk_multipliers["f"] == pytest.approx(3.0)
        assert c.value_shocks["c"] == pytest.approx(0.75)  # 1-(0.5*0.5)

    def test_export_results_roundtrips(self, tmp_path):
        import json

        an = self._analyzer()
        an.analyze_scenario(Scenario("base"))
        path = an.export_results(str(tmp_path / "sub" / "res.json"))
        data = json.loads(open(path).read())
        assert "base" in data
        assert "asset_risks" not in data["base"]  # detail dropped
        assert data["base"]["statistics"]["mean"] >= 0


class TestMultiRegionAnalysisLayer:
    """ref: multiregion_analysis.py:644 identify_high_risk_assets,
    :684 calculate_diversification_benefit, :736
    perform_cross_region_analysis, :386/:410 save/load."""

    def _setup(self):
        from njw_tpu.geofinancial import RegionalPortfolio

        model = GeospatialRiskModel(
            [create_elevation_risk_factor(dem64())])
        mr = MultiRegionRiskModel()
        south = RegionDefinition("south", 0, 64, 0, 32)
        north = RegionDefinition("north", 0, 64, 32, 64)
        mr.add_region(south, model).add_region(north, model)
        rp = RegionalPortfolio(portfolio(), [south, north])
        return mr, rp

    def test_assess_regional_risks_groups_assets(self):
        mr, rp = self._setup()
        rr = mr.assess_regional_risks(rp.portfolio)
        assert set(rr) == {"south", "north"}
        assert set(rr["south"]) == {"low1", "low2"}
        assert set(rr["north"]) == {"high1"}

    def test_identify_high_risk_assets_threshold_and_topn(self):
        mr, rp = self._setup()
        rr = mr.assess_regional_risks(rp.portfolio)
        high = mr.identify_high_risk_assets(rr, threshold=0.5)
        assert {a["asset_id"] for a in high["south"]} == {"low1", "low2"}
        assert high["north"] == []  # high ground is low risk
        capped = mr.identify_high_risk_assets(rr, threshold=0.0,
                                              top_n=1)
        assert len(capped["south"]) == 1
        # Sorted descending: first is the riskiest.
        assert capped["south"][0]["risk_score"] == max(
            rr["south"].values())

    def test_diversification_benefit_bounds(self):
        mr, rp = self._setup()
        rr = mr.assess_regional_risks(rp.portfolio)
        benefit = mr.calculate_diversification_benefit(rr, rp)
        assert -1.0 <= benefit <= 1.0

    def test_cross_region_analysis_structure(self):
        mr, rp = self._setup()
        res = mr.perform_cross_region_analysis(rp, threshold=0.5)
        assert res["statistics"]["south"]["n_assets"] == 2
        corr = np.asarray(res["risk_correlations"]["matrix"])
        assert corr.shape == (2, 2)
        assert np.allclose(np.diag(corr), 1.0)
        alloc = res["recommended_allocation"]
        assert sum(alloc.values()) == pytest.approx(1.0)
        # Lower-risk north should be over-allocated vs risky south.
        assert alloc["north"] > alloc["south"]

    def test_save_load_roundtrip(self, tmp_path):
        from njw_tpu.geofinancial import RegionalPortfolio

        _, rp = self._setup()
        rp.portfolio.assets[0].returns = np.array([0.01, -0.02])
        path = rp.save(str(tmp_path / "rp.json"))
        back = RegionalPortfolio.load(path)
        assert [a.id for a in back.portfolio.assets] == \
            [a.id for a in rp.portfolio.assets]
        assert [r.name for r in back.regions] == ["south", "north"]
        np.testing.assert_allclose(back.portfolio.assets[0].returns,
                                   [0.01, -0.02])
        assert back.split()["south"].total_value == \
            rp.split()["south"].total_value

    def test_region_of(self):
        _, rp = self._setup()
        assert rp.region_of(rp.portfolio.assets[0]) == "south"
        assert rp.region_of(rp.portfolio.assets[2]) == "north"
