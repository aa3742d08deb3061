"""Geo-financial visualization.

ref: src/integrations/geo_financial/visualization.py:1-575 (risk maps,
portfolio maps, risk distributions, scenario comparisons). Matplotlib-Agg
static renders; the live/interactive views are the dashboard's canvas
client (njw_tpu/dashboard/geofin.py + static/geofin.html).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_risk_map(model, path: str, *, shape=(256, 256), extent=None,
                  portfolio=None) -> str:
    """Combined risk surface with optional asset overlay (value-sized)."""
    plt = _plt()
    if model.risk_factors:
        h0, w0 = model.risk_factors[0].risk_data.shape
    else:
        h0, w0 = shape
    ys = np.linspace(0, h0 - 1, shape[0])
    xs = np.linspace(0, w0 - 1, shape[1])
    gx, gy = np.meshgrid(xs, ys)
    grid = model.assess_risk(gx.ravel(), gy.ravel()).reshape(shape)
    fig, ax = plt.subplots(figsize=(6.5, 5))
    im = ax.imshow(grid, cmap="YlOrRd", origin="lower", vmin=0, vmax=1,
                   extent=extent)
    fig.colorbar(im, ax=ax, label="combined risk")
    if portfolio is not None:
        vals = np.asarray([a.value for a in portfolio.assets])
        sizes = 10 + 90 * vals / max(vals.max(), 1e-12)
        ax.scatter([a.x for a in portfolio.assets],
                   [a.y for a in portfolio.assets], s=sizes,
                   facecolor="white", edgecolor="black", alpha=0.8,
                   label="assets")
        ax.legend(loc="upper right")
    ax.set_title("risk map")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_portfolio_map(portfolio, risks: dict, path: str) -> str:
    """Assets colored by risk, sized by value (ref portfolio map)."""
    plt = _plt()
    xs = [a.x for a in portfolio.assets]
    ys = [a.y for a in portfolio.assets]
    vals = np.asarray([a.value for a in portfolio.assets])
    r = np.asarray([risks.get(a.id, 0.0) for a in portfolio.assets])
    fig, ax = plt.subplots(figsize=(6.5, 5))
    sc = ax.scatter(xs, ys, c=r, s=10 + 140 * vals / vals.max(),
                    cmap="RdYlGn_r", vmin=0, vmax=1, edgecolor="k",
                    linewidth=0.4)
    fig.colorbar(sc, ax=ax, label="asset risk")
    ax.set_title("portfolio")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_risk_distribution(risks: dict, path: str, *, bins: int = 20) -> str:
    plt = _plt()
    vals = np.asarray(list(risks.values()), np.float64)
    fig, ax = plt.subplots(figsize=(6, 3.5))
    ax.hist(vals, bins=bins, range=(0, 1), color="#c0504d",
            edgecolor="white")
    ax.axvline(vals.mean(), color="k", linestyle="--",
               label=f"mean {vals.mean():.2f}")
    ax.set_xlabel("risk")
    ax.set_ylabel("assets")
    ax.set_title("risk distribution")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_scenario_comparison(results: list[dict], path: str) -> str:
    """Horizontal loss bars per scenario (ScenarioAnalyzer.evaluate rows)."""
    plt = _plt()
    names = [r["scenario"] for r in results]
    losses = [r["total_loss"] for r in results]
    fig, ax = plt.subplots(figsize=(6.5, 0.5 + 0.45 * len(names)))
    ax.barh(names, losses, color="#4878cf")
    ax.set_xlabel("total loss (USD)")
    ax.set_title("scenario losses")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_returns(returns, path: str, *, max_series: int = 12) -> str:
    """Cumulative return paths (ref financial time-series view)."""
    plt = _plt()
    r = np.asarray(returns, np.float64)
    if r.ndim == 1:
        r = r[:, None]
    cum = np.cumprod(1.0 + r[:, :max_series], axis=0)
    fig, ax = plt.subplots(figsize=(6.5, 3.5))
    ax.plot(cum, linewidth=0.9)
    ax.axhline(1.0, color="#999", linewidth=0.7)
    ax.set_xlabel("day")
    ax.set_ylabel("growth of $1")
    ax.set_title("asset returns")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def generate_geofin_report(output_dir: str, portfolio, model, *,
                           scenarios=None, returns=None) -> str:
    """All applicable views + HTML index (the static-report counterpart
    of the live dashboard)."""
    import html

    os.makedirs(output_dir, exist_ok=True)
    j = os.path.join
    risks = portfolio.assess_risk(model)
    plots = [
        plot_risk_map(model, j(output_dir, "risk_map.png"),
                      portfolio=portfolio),
        plot_portfolio_map(portfolio, risks,
                           j(output_dir, "portfolio.png")),
        plot_risk_distribution(risks, j(output_dir, "distribution.png")),
    ]
    rows = ""
    if scenarios is not None:
        from njw_tpu.geofinancial.scenarios import ScenarioAnalyzer

        analyzer = ScenarioAnalyzer(portfolio, model)
        agg = analyzer.evaluate_set(scenarios)
        plots.append(plot_scenario_comparison(
            agg["results"], j(output_dir, "scenarios.png")))
        rows = (f"<tr><td>expected loss</td>"
                f"<td>{agg['expected_loss']:,.0f}</td></tr>"
                f"<tr><td>worst case</td>"
                f"<td>{html.escape(agg['worst_case'])}</td></tr>")
    if returns is not None:
        plots.append(plot_returns(returns, j(output_dir, "returns.png")))
    total = portfolio.total_value
    vals = np.asarray(list(risks.values()))
    rows = (f"<tr><td>total value</td><td>{total:,.0f}</td></tr>"
            f"<tr><td>mean risk</td><td>{vals.mean():.3f}</td></tr>"
            + rows)
    imgs = "".join(f'<img src="{os.path.basename(p)}" '
                   'style="max-width:48%">' for p in plots)
    page = ("<!doctype html><html><head><meta charset='utf-8'>"
            "<title>geo-financial report</title></head><body>"
            "<h1>geo-financial report</h1>"
            f"<table border=1>{rows}</table>{imgs}</body></html>")
    out = j(output_dir, "index.html")
    with open(out, "w") as fh:
        fh.write(page)
    return out
