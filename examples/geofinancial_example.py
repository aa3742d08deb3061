"""Geo-financial pipeline example (ref: geo_financial run scripts role):
synthetic data -> risk model -> scenarios -> static report."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from njw_tpu.geofinancial import (
    GeospatialRiskModel, create_elevation_risk_factor,
    create_flood_risk_factor, generate_assets, generate_dem,
)
from njw_tpu.geofinancial.scenarios import (
    ScenarioAnalyzer, create_climate_scenarios,
)
from njw_tpu.viz.geofinancial import generate_geofin_report


def main(out_dir="geofin_output"):
    dem = generate_dem(256, seed=11)
    model = GeospatialRiskModel([
        create_flood_risk_factor(dem, weight=1.0),
        create_elevation_risk_factor(dem, weight=0.5),
    ])
    portfolio = generate_assets(80, extent=256.0, seed=11)

    risks = portfolio.assess_risk(model)
    el = portfolio.expected_loss(model)
    print(f"assets: {len(portfolio.assets)}  "
          f"total: ${portfolio.total_value:,.0f}  "
          f"expected loss: ${el:,.0f}")

    analyzer = ScenarioAnalyzer(portfolio, model)
    agg = analyzer.evaluate_set(create_climate_scenarios())
    print(f"worst case: {agg['worst_case']} (${agg['worst_loss']:,.0f})")
    print(f"VaR95: ${analyzer.var(create_climate_scenarios(), 0.95):,.0f}")

    page = generate_geofin_report(out_dir, portfolio, model,
                                  scenarios=create_climate_scenarios())
    print(f"report: {page}")


if __name__ == "__main__":
    main()
