"""Dashboard server: REST endpoints + static UI (ref role:
src/visualization React app consuming localhost:5000/api)."""
import json
import urllib.request

import pytest

from njw_tpu.dashboard import DashboardServer


@pytest.fixture
def server(tmp_path):
    results = [{
        "workload": "weather", "device": "tpu:v5e",
        "execution_time_s": 1.0, "throughput": 5e9,
        "throughput_unit": "grid-points/s", "memory_bytes": 1000,
        "additional_metrics": {}, "cost_metrics": {},
        "timestamp": "2026-01-01T00:00:00",
    }]
    path = tmp_path / "results.json"
    path.write_text(json.dumps(results))
    srv = DashboardServer(str(path), port=0).start()
    yield srv
    srv.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.status, resp.read()


def test_api_results(server):
    status, body = _get(server.url + "/api/results")
    assert status == 200
    rows = json.loads(body)
    assert rows[0]["workload"] == "weather"


def test_api_workloads(server):
    _, body = _get(server.url + "/api/workloads")
    assert json.loads(body) == ["weather"]


def test_api_cluster(server):
    """Cluster overview (ref: ClusterOverview.tsx role): device info +
    per-workload summaries derived from the results history."""
    _, body = _get(server.url + "/api/cluster")
    c = json.loads(body)
    assert c["platform"] in ("cpu", "tpu", "gpu")
    assert c["num_devices"] >= 1
    assert c["total_runs"] == 1
    (wl,) = c["workloads"]
    assert wl["workload"] == "weather"
    assert wl["runs"] == 1
    assert wl["best_throughput"] == 5e9


def test_api_history(server):
    """Per-workload throughput time series (ref: PerformanceChart.tsx
    role), sorted by timestamp."""
    _, body = _get(server.url + "/api/history")
    series = json.loads(body)
    (s,) = series
    assert s["workload"] == "weather"
    assert [p["throughput"] for p in s["points"]] == [5e9]
    ts = [p["timestamp"] for p in s["points"]]
    assert ts == sorted(ts)


def test_api_schema_matches_python_dataclass(server):
    """The served schema comes from proto/dashboard.proto and must agree
    field-for-field with bench.suite.BenchmarkResult (no silent drift)."""
    from njw_tpu.dashboard.schema import check_result_schema

    check_result_schema()
    _, body = _get(server.url + "/api/schema")
    schema = json.loads(body)
    assert "BenchmarkResultRow" in schema
    assert schema["BenchmarkResultRow"]["throughput"]["type"] == "double"
    assert "ClusterInfo" in schema and "HistorySeries" in schema


def test_rows_are_normalized(tmp_path):
    """Rows missing optional fields are coerced to the typed schema."""
    path = tmp_path / "r.json"
    path.write_text(json.dumps([{
        "workload": "x", "device": "cpu", "execution_time_s": 1,
        "throughput": 2, "throughput_unit": "u",
        "timestamp": "2026-01-01T00:00:00"}]))
    srv = DashboardServer(str(path), port=0).start()
    try:
        _, body = _get(srv.url + "/api/results")
        (row,) = json.loads(body)
        assert row["memory_bytes"] == 0
        assert row["additional_metrics"] == {}
        assert isinstance(row["throughput"], float)
    finally:
        srv.stop()


def test_cluster_and_perf_pages_served(server):
    for page, marker in (("/cluster", b"cluster overview"),
                         ("/perf", b"throughput over run history")):
        status, body = _get(server.url + page)
        assert status == 200
        assert marker in body


def test_index_served(server):
    status, body = _get(server.url + "/")
    assert status == 200
    assert b"njw_tpu" in body


def test_404(server):
    with pytest.raises(urllib.error.HTTPError):
        _get(server.url + "/nope")


class TestGeoFinDashboard:
    """Geo-financial views + SSE (ref: dashboard_app.py /
    realtime_dashboard.py roles, re-designed as JSON + SSE)."""

    @pytest.fixture
    def geofin_server(self, tmp_path):
        from njw_tpu.dashboard.geofin import GeoFinDashboard
        from njw_tpu.geofinancial.geo_risk import (
            GeospatialRiskModel, create_flood_risk_factor,
        )
        from njw_tpu.geofinancial.scenarios import create_climate_scenarios
        from njw_tpu.geofinancial.testdata import (
            generate_assets, generate_dem,
        )

        dem = generate_dem(64, seed=2)
        model = GeospatialRiskModel([create_flood_risk_factor(dem)])
        port = generate_assets(20, extent=64.0, seed=2)
        gf = GeoFinDashboard(port, model,
                             scenarios=create_climate_scenarios())
        path = tmp_path / "results.json"
        path.write_text("[]")
        srv = DashboardServer(str(path), port=0, geofin=gf).start()
        yield srv, gf
        srv.stop()

    def test_portfolio_view(self, geofin_server):
        srv, _ = geofin_server
        _, body = _get(srv.url + "/api/geofin/portfolio")
        p = json.loads(body)
        assert len(p["assets"]) == 20
        assert p["total_value"] > 0
        assert 0.0 <= p["value_weighted_risk"] <= 1.0

    def test_riskmap_view(self, geofin_server):
        srv, _ = geofin_server
        _, body = _get(srv.url + "/api/geofin/riskmap?w=32&h=16")
        m = json.loads(body)
        assert len(m["grid"]) == 16 and len(m["grid"][0]) == 32
        assert all(0.0 <= v <= 1.0 for row in m["grid"] for v in row)
        assert len(m["assets"]) == 20

    def test_scenarios_view(self, geofin_server):
        srv, _ = geofin_server
        _, body = _get(srv.url + "/api/geofin/scenarios")
        s = json.loads(body)
        assert len(s["scenarios"]) >= 3
        assert s["worst_loss"] >= s["scenarios"][0]["total_loss"] * 0 \
            and s["expected_loss"] > 0

    def test_geofin_page_served(self, geofin_server):
        srv, _ = geofin_server
        status, body = _get(srv.url + "/geofin")
        assert status == 200 and b"risk map" in body

    def test_sse_stream_delivers_published_events(self, geofin_server):
        import threading

        srv, gf = geofin_server
        got = {}

        def read_stream():
            req = urllib.request.urlopen(srv.url + "/api/stream",
                                         timeout=10)
            while True:
                line = req.readline()
                if line.startswith(b"data:"):
                    got["event"] = json.loads(line[5:].decode())
                    return

        t = threading.Thread(target=read_stream, daemon=True)
        t.start()
        import time as _time

        _time.sleep(0.3)
        gf.on_stream_event({"ts": 1.0, "prices": {"NJW": 100.0}})
        t.join(timeout=10)
        assert got["event"]["type"] == "portfolio_update"

    def test_stream_event_reprices_assets(self, geofin_server):
        _, gf = geofin_server
        for a in gf.portfolio.assets:
            a.metadata["symbol"] = "NJW"
        v0 = gf.portfolio.total_value
        gf.on_stream_event({"ts": 1.0, "prices": {"NJW": 100.0}})
        gf.on_stream_event({"ts": 2.0, "prices": {"NJW": 110.0}})
        assert gf.portfolio.total_value == pytest.approx(1.1 * v0, rel=1e-6)

    def test_geofin_404_without_context(self, server):
        status = urllib.request.urlopen(
            server.url + "/api/geofin/portfolio", timeout=10
        ) if False else None
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(server.url + "/api/geofin/portfolio")
        assert exc.value.code == 404
