"""Scenario analysis.

ref: scenario_analysis.py:71 Scenario, :229 ScenarioSet,
:332 ScenarioAnalyzer, :1786-1985 climate/economic/stress factories.
"""
from __future__ import annotations

from dataclasses import dataclass, field
import numpy as np

from njw_tpu.geofinancial.geo_risk import (
    GeospatialPortfolio, GeospatialRiskModel,
)


@dataclass
class Scenario:
    """A named what-if: risk multiplier per factor name + value shocks per
    asset-class (ref: scenario_analysis.py:71)."""

    name: str
    description: str = ""
    risk_multipliers: dict = field(default_factory=dict)   # factor -> mult
    value_shocks: dict = field(default_factory=dict)       # class -> frac
    probability: float = 1.0


@dataclass
class ScenarioSet:
    """ref: scenario_analysis.py:229."""

    name: str
    scenarios: list = field(default_factory=list)

    def add(self, s: Scenario):
        self.scenarios.append(s)
        return self

    def normalized_probabilities(self) -> np.ndarray:
        p = np.asarray([s.probability for s in self.scenarios], np.float64)
        return p / max(p.sum(), 1e-12)


class ScenarioAnalyzer:
    """Evaluate portfolio loss under each scenario
    (ref: ScenarioAnalyzer, scenario_analysis.py:332)."""

    def __init__(self, portfolio: GeospatialPortfolio,
                 model: GeospatialRiskModel):
        self.portfolio = portfolio
        self.model = model

    def _scenario_risk(self, scenario: Scenario) -> np.ndarray:
        x, y = self.portfolio.coords()
        acc = np.zeros_like(x, dtype=np.float64)
        total_w = 0.0
        for rf in self.model.risk_factors:
            mult = scenario.risk_multipliers.get(rf.name, 1.0)
            acc += rf.risk_weight * np.clip(rf.sample(x, y) * mult, 0, 1)
            total_w += rf.risk_weight
        return acc / max(total_w, 1e-12)

    def evaluate(self, scenario: Scenario) -> dict:
        risks = self._scenario_risk(scenario)
        losses = []
        for a, r in zip(self.portfolio.assets, risks):
            shock = scenario.value_shocks.get(
                a.metadata.get("asset_class", "default"),
                scenario.value_shocks.get("default", 0.0))
            losses.append(a.value * min(float(r) + shock, 1.0))
        total = float(sum(losses))
        return {
            "scenario": scenario.name,
            "total_loss": total,
            "loss_fraction": total / max(self.portfolio.total_value, 1e-12),
            "mean_risk": float(risks.mean()),
            "max_risk": float(risks.max()),
        }

    def evaluate_set(self, sset: ScenarioSet) -> dict:
        results = [self.evaluate(s) for s in sset.scenarios]
        p = sset.normalized_probabilities()
        expected = float(sum(pi * r["total_loss"]
                             for pi, r in zip(p, results)))
        worst = max(results, key=lambda r: r["total_loss"])
        return {
            "set": sset.name,
            "results": results,
            "expected_loss": expected,
            "worst_case": worst["scenario"],
            "worst_loss": worst["total_loss"],
        }

    def var(self, sset: ScenarioSet, confidence: float = 0.95) -> float:
        """Scenario-weighted value at risk."""
        results = [self.evaluate(s)["total_loss"] for s in sset.scenarios]
        p = sset.normalized_probabilities()
        order = np.argsort(results)
        cum = np.cumsum(p[order])
        idx = np.searchsorted(cum, confidence)
        return float(results[order[min(idx, len(results) - 1)]])


def create_climate_scenarios() -> ScenarioSet:
    """ref: scenario_analysis.py:1786."""
    return ScenarioSet("climate", [
        Scenario("baseline", "current climate", {}, {}, 0.5),
        Scenario("2c_warming", "moderate warming",
                 {"flood_risk": 1.3, "heatwave_risk": 1.4}, {}, 0.3),
        Scenario("4c_warming", "severe warming",
                 {"flood_risk": 1.8, "heatwave_risk": 2.0,
                  "sea_level_rise": 1.6}, {"coastal": 0.1}, 0.2),
    ])


def create_economic_scenarios() -> ScenarioSet:
    """ref: scenario_analysis.py:1880."""
    return ScenarioSet("economic", [
        Scenario("expansion", "growth", {}, {"default": -0.05}, 0.4),
        Scenario("recession", "downturn", {}, {"default": 0.15}, 0.4),
        Scenario("crisis", "financial crisis", {},
                 {"default": 0.35, "real_estate": 0.45}, 0.2),
    ])


def create_stress_scenarios() -> ScenarioSet:
    """ref: scenario_analysis.py:1940."""
    return ScenarioSet("stress", [
        Scenario("combined_stress", "climate + economic stress",
                 {"flood_risk": 2.0, "heatwave_risk": 1.8},
                 {"default": 0.25}, 1.0),
    ])
