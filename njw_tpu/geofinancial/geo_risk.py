"""Spatial risk factors + geospatial portfolio risk model.

ref: geo_risk.py:22 SpatialRiskFactor, :129 GeospatialRiskModel,
:243 GeospatialPortfolio, :454-544 DEM-derived factor constructors.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from njw_tpu.geospatial.dem import GeoTransform, terrain_derivatives

# Identity mapping (row = y, col = x). The GDAL default is north-up
# (pixel_height = -1), which flips y; risk surfaces built directly from
# row-major arrays want the identity.
IDENTITY_TRANSFORM = GeoTransform(pixel_height=1.0)


@dataclass
class SpatialRiskFactor:
    """A named risk surface over a geographic grid, sampled at asset
    locations (ref: geo_risk.py:22). risk_data in [0, 1]."""

    name: str
    risk_weight: float
    risk_data: np.ndarray
    geo_transform: GeoTransform = field(
        default_factory=lambda: IDENTITY_TRANSFORM)
    description: str = ""

    def __post_init__(self):
        self.risk_data = np.clip(np.asarray(self.risk_data, np.float32),
                                 0.0, 1.0)

    def sample(self, x, y) -> np.ndarray:
        """Bilinear-sample the risk surface at geo coords (vectorized)."""
        row, col = self.geo_transform.geo_to_pixel(np.asarray(x),
                                                   np.asarray(y))
        h, w = self.risk_data.shape
        r0 = np.clip(np.floor(row).astype(int), 0, h - 2)
        c0 = np.clip(np.floor(col).astype(int), 0, w - 2)
        fr = np.clip(row - r0, 0.0, 1.0)
        fc = np.clip(col - c0, 0.0, 1.0)
        d = self.risk_data
        return ((1 - fr) * (1 - fc) * d[r0, c0]
                + (1 - fr) * fc * d[r0, c0 + 1]
                + fr * (1 - fc) * d[r0 + 1, c0]
                + fr * fc * d[r0 + 1, c0 + 1])


def _normalize(a: np.ndarray, invert: bool = False) -> np.ndarray:
    a = np.asarray(a, np.float32)
    lo, hi = np.nanmin(a), np.nanmax(a)
    n = (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)
    return 1.0 - n if invert else n


def create_elevation_risk_factor(dem, weight: float = 1.0,
                                 geo_transform=IDENTITY_TRANSFORM,
                                 low_is_risky: bool = True):
    """Low-lying terrain is risky (flooding) (ref: geo_risk.py:454)."""
    return SpatialRiskFactor(
        "elevation_risk", weight, _normalize(dem, invert=low_is_risky),
        geo_transform, "normalized (inverse) elevation")


def create_slope_risk_factor(dem, weight: float = 1.0,
                             geo_transform=IDENTITY_TRANSFORM,
                             cell_size: float = 1.0):
    """Steep slopes are risky (landslide) (ref: geo_risk.py:490)."""
    slope = np.asarray(terrain_derivatives(jnp.asarray(dem), cell_size)["slope"])
    return SpatialRiskFactor("slope_risk", weight, _normalize(slope),
                             geo_transform, "normalized slope")


def create_flood_risk_factor(dem, weight: float = 1.0,
                             geo_transform=IDENTITY_TRANSFORM,
                             n_iterations: int = 128):
    """Flow accumulation + low elevation -> flood risk
    (ref: geo_risk.py:520)."""
    from njw_tpu.geospatial.dem import fill_sinks, flow_accumulation

    filled = fill_sinks(jnp.asarray(dem, jnp.float32), n_iterations)
    acc = np.asarray(flow_accumulation(filled, n_iterations))
    risk = 0.5 * _normalize(np.log1p(acc)) + 0.5 * _normalize(dem, invert=True)
    return SpatialRiskFactor("flood_risk", weight, risk, geo_transform,
                             "flow accumulation + low elevation")


class GeospatialRiskModel:
    """Weighted combination of spatial risk factors (ref: geo_risk.py:129)."""

    def __init__(self, risk_factors: Optional[list] = None):
        self.risk_factors: list[SpatialRiskFactor] = risk_factors or []

    def add_risk_factor(self, rf: SpatialRiskFactor):
        self.risk_factors.append(rf)
        return self

    def assess_risk(self, x, y) -> np.ndarray:
        """Weighted average of factor risks at asset locations."""
        if not self.risk_factors:
            return np.zeros_like(np.asarray(x, np.float32))
        total_w = sum(rf.risk_weight for rf in self.risk_factors)
        acc = np.zeros_like(np.asarray(x, np.float32))
        for rf in self.risk_factors:
            acc = acc + rf.risk_weight * rf.sample(x, y)
        return acc / max(total_w, 1e-12)


@dataclass
class Asset:
    id: str
    name: str
    value: float
    x: float
    y: float
    metadata: dict = field(default_factory=dict)
    returns: Optional[np.ndarray] = None  # daily simple returns, oldest first


class GeospatialPortfolio:
    """Assets with locations + values; batched risk assessment
    (ref: geo_risk.py:243; the reference's GPU-aware per-asset loop becomes
    one vectorized sample)."""

    def __init__(self, assets: Optional[list[Asset]] = None):
        self.assets: list[Asset] = assets or []

    def add_asset(self, id, name, value, x, y, metadata=None,
                  returns=None):
        self.assets.append(Asset(
            id, name, value, x, y, metadata or {},
            None if returns is None else np.asarray(returns, np.float64)))
        return self

    @property
    def total_value(self) -> float:
        return float(sum(a.value for a in self.assets))

    def coords(self):
        return (np.asarray([a.x for a in self.assets], np.float32),
                np.asarray([a.y for a in self.assets], np.float32))

    def assess_risk(self, model: GeospatialRiskModel) -> dict[str, float]:
        """Per-asset risk scores keyed by asset id."""
        if not self.assets:
            return {}
        x, y = self.coords()
        scores = model.assess_risk(x, y)
        return {a.id: float(s) for a, s in zip(self.assets, scores)}

    def value_at_risk(self, model: GeospatialRiskModel,
                      threshold: float = 0.5) -> float:
        """Total value of assets whose risk exceeds the threshold."""
        risks = self.assess_risk(model)
        return float(sum(a.value for a in self.assets
                         if risks[a.id] >= threshold))

    def expected_loss(self, model: GeospatialRiskModel,
                      damage_ratio: float = 1.0) -> float:
        risks = self.assess_risk(model)
        return float(sum(a.value * risks[a.id] * damage_ratio
                         for a in self.assets))

    # -- returns-based metrics (the financial_modeling wiring) ----------

    def _asset_returns(self, lookback_days: int) -> np.ndarray:
        """(n_assets, lookback) return matrix; raises like the reference
        when any asset lacks history (ref: geo_risk.py:370-377)."""
        rows = []
        for a in self.assets:
            if a.returns is None or len(a.returns) < lookback_days:
                raise ValueError(
                    f"Asset {a.id} has insufficient returns data")
            rows.append(np.asarray(a.returns,
                                   np.float64)[-lookback_days:])
        return np.stack(rows)

    def calculate_var(self, confidence_level: float = 0.95,
                      lookback_days: int = 252,
                      method: str = "historical") -> float:
        """Value-weighted portfolio VaR from asset return histories
        (ref: geo_risk.py:386 risk_analyzer.calculate_var)."""
        from njw_tpu.geofinancial.risk_metrics import RiskMetricsAnalyzer

        asset_returns = self._asset_returns(lookback_days)
        total = self.total_value
        weights = np.asarray([a.value / total for a in self.assets])
        portfolio_returns = weights @ asset_returns
        return RiskMetricsAnalyzer().calculate_var(
            portfolio_returns, confidence_level, method)

    def optimize_for_geo_risk(self, risk_model: GeospatialRiskModel,
                              target_return: float,
                              max_risk_score: float = 0.5,
                              risk_aversion: float = 1.0,
                              lookback_days: int = 252,
                              max_weight: float = 0.3) -> dict:
        """Mean-variance weights with geo-risk-adjusted expected returns
        (ref: geo_risk.py:424): mu_adj = mu - risk_aversion * geo_risk;
        assets whose geo-risk exceeds max_risk_score are excluded
        (weight 0). Returns {asset_id: weight}.
        """
        from njw_tpu.geofinancial.portfolio import PortfolioOptimizer

        risk_scores = self.assess_risk(risk_model)
        asset_returns = self._asset_returns(lookback_days)
        mu = asset_returns.mean(axis=1)
        cov = np.atleast_2d(np.cov(asset_returns))
        risk = np.asarray([risk_scores[a.id] for a in self.assets])
        adjusted = mu - risk_aversion * risk
        keep = np.flatnonzero(risk <= max_risk_score)
        if keep.size == 0:
            raise ValueError(
                f"no assets with geo-risk <= {max_risk_score}")
        result = PortfolioOptimizer().optimize(
            adjusted[keep], cov[np.ix_(keep, keep)], target_return,
            constraints={"max_weight": max_weight})
        weights = {a.id: 0.0 for a in self.assets}
        for i, k in enumerate(keep):
            weights[self.assets[k].id] = float(result["weights"][i])
        return weights
