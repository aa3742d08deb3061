"""Geospatial-financial risk integration.

Capability parity with the reference's cross-workload integration
(src/integrations/geo_financial/, ~12.8k LoC pure Python; SURVEY §2.7):
spatial risk factors from DEM products, portfolio risk assessment, risk
aggregation + surfaces, climate risk (flood/heatwave/sea-level), scenario
analysis, multi-region analysis, realtime streams, and device-aware batch
optimization (the reference's JetsonOptimizer becomes a TPU batch planner).

Everything is jnp-vectorized over assets/grid cells — the reference's
per-asset Python loops become batched array ops.
"""
from njw_tpu.geofinancial.geo_risk import (
    SpatialRiskFactor, GeospatialRiskModel, GeospatialPortfolio,
    create_elevation_risk_factor, create_slope_risk_factor,
    create_flood_risk_factor,
)
from njw_tpu.geofinancial.aggregation import (
    AggregationMethod, RiskAggregator, RiskSurfaceGenerator,
)
from njw_tpu.geofinancial.climate import (
    ClimateHazardType, ClimateScenario, TimeHorizon, ClimateRiskAssessor,
    create_heatwave_risk_factor, create_sea_level_rise_factor,
)
from njw_tpu.geofinancial.scenarios import (
    Scenario, ScenarioSet, ScenarioAnalyzer, create_climate_scenarios,
    create_economic_scenarios, create_stress_scenarios,
)
from njw_tpu.geofinancial.data import (
    AssetLocationDataLoader, FinancialDataLoader, GeoRiskDataLoader,
    export_portfolio_geojson,
)
from njw_tpu.geofinancial.testdata import (
    generate_assets, generate_dem, generate_returns, generate_dataset,
)
from njw_tpu.geofinancial.multiregion import (
    RegionDefinition, RegionalPortfolio, MultiRegionRiskModel,
    RegionalRiskComparator,
)
from njw_tpu.geofinancial.realtime import (
    DataStreamSource, MarketDataStream, GeospatialEventStream,
)
from njw_tpu.geofinancial.optimizer import TPUOptimizer
from njw_tpu.geofinancial.risk_metrics import (
    RiskMetricsAnalyzer, historical_var, parametric_var, monte_carlo_var,
    cvar, sharpe_ratio, sortino_ratio, max_drawdown, risk_attribution,
)
from njw_tpu.geofinancial.portfolio import (
    PortfolioOptimizer, mean_variance_optimize, efficient_frontier,
    risk_parity, black_litterman, monte_carlo_simulation,
)
from njw_tpu.geofinancial.options import (
    OptionsPricer, black_scholes, greeks, binomial_tree,
    monte_carlo_price, barrier_option_price, asian_option_price,
)
