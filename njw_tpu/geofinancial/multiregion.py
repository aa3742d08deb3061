"""Multi-region risk analysis.

ref: multiregion_analysis.py:56 RegionDefinition, :451 MultiRegionRiskModel,
RegionalPortfolio / RegionalRiskComparator (:56-964), grid helpers
(:1776-1876).
"""
from __future__ import annotations

from dataclasses import dataclass, field
import numpy as np

from njw_tpu.geofinancial.geo_risk import (
    GeospatialPortfolio, GeospatialRiskModel,
)


@dataclass
class RegionDefinition:
    """A named rectangular region (ref: multiregion_analysis.py:56)."""

    name: str
    x_min: float
    x_max: float
    y_min: float
    y_max: float
    metadata: dict = field(default_factory=dict)

    def contains(self, x, y) -> np.ndarray:
        x = np.asarray(x)
        y = np.asarray(y)
        return ((x >= self.x_min) & (x <= self.x_max)
                & (y >= self.y_min) & (y <= self.y_max))


class RegionalPortfolio:
    """Portfolio partitioned by region (ref: multiregion_analysis.py)."""

    def __init__(self, portfolio: GeospatialPortfolio,
                 regions: list[RegionDefinition]):
        self.portfolio = portfolio
        self.regions = regions

    def split(self) -> dict[str, GeospatialPortfolio]:
        x, y = self.portfolio.coords()
        out = {}
        for region in self.regions:
            mask = region.contains(x, y)
            sub = GeospatialPortfolio(
                [a for a, m in zip(self.portfolio.assets, mask) if m])
            out[region.name] = sub
        return out


class MultiRegionRiskModel:
    """Per-region risk models + cross-region rollup
    (ref: MultiRegionRiskModel, multiregion_analysis.py:451)."""

    def __init__(self):
        self.region_models: dict[str, GeospatialRiskModel] = {}
        self.regions: dict[str, RegionDefinition] = {}

    def add_region(self, region: RegionDefinition,
                   model: GeospatialRiskModel):
        self.regions[region.name] = region
        self.region_models[region.name] = model
        return self

    def assess(self, portfolio: GeospatialPortfolio) -> dict:
        """Per-region summary: asset count, value, mean risk, expected
        loss; assets outside every region go to '_unassigned'."""
        x, y = portfolio.coords()
        assigned = np.zeros(len(portfolio.assets), bool)
        out = {}
        for name, region in self.regions.items():
            mask = region.contains(x, y) & ~assigned
            assigned |= mask
            sub = GeospatialPortfolio(
                [a for a, m in zip(portfolio.assets, mask) if m])
            model = self.region_models[name]
            risks = sub.assess_risk(model)
            vals = np.asarray([a.value for a in sub.assets])
            rs = np.asarray([risks[a.id] for a in sub.assets]) \
                if sub.assets else np.zeros(0)
            out[name] = {
                "n_assets": len(sub.assets),
                "total_value": float(vals.sum()) if len(vals) else 0.0,
                "mean_risk": float(rs.mean()) if len(rs) else 0.0,
                "expected_loss": float((vals * rs).sum()) if len(rs) else 0.0,
            }
        n_un = int((~assigned).sum())
        if n_un:
            out["_unassigned"] = {"n_assets": n_un}
        return out


class RegionalRiskComparator:
    """Rank regions by risk metrics (ref: RegionalRiskComparator)."""

    def __init__(self, model: MultiRegionRiskModel):
        self.model = model

    def rank(self, portfolio: GeospatialPortfolio,
             by: str = "expected_loss") -> list[tuple[str, float]]:
        summary = self.model.assess(portfolio)
        rows = [(name, stats.get(by, 0.0))
                for name, stats in summary.items()
                if not name.startswith("_")]
        return sorted(rows, key=lambda kv: kv[1], reverse=True)


def make_region_grid(x_min, x_max, y_min, y_max, nx: int, ny: int,
                     prefix: str = "region") -> list[RegionDefinition]:
    """Tile a bounding box into nx x ny regions
    (ref grid helpers: multiregion_analysis.py:1776-1876)."""
    xs = np.linspace(x_min, x_max, nx + 1)
    ys = np.linspace(y_min, y_max, ny + 1)
    out = []
    for j in range(ny):
        for i in range(nx):
            out.append(RegionDefinition(
                f"{prefix}_{j}_{i}", xs[i], xs[i + 1], ys[j], ys[j + 1]))
    return out
