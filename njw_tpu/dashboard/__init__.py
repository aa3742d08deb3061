"""Benchmark dashboard.

ref parity: src/visualization/ (React/TS dashboard consuming REST +
socket.io at localhost:5000, ref: WorkloadContext.tsx:8-155). Here: a
dependency-free stdlib HTTP server serving the same typed JSON result
schema at /api/results plus a static single-page UI (vanilla JS, no CDN —
works offline). Start with:

    python -m njw_tpu.dashboard --results benchmark_results/results.json
"""
from njw_tpu.dashboard.server import DashboardServer
