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


def test_index_served(server):
    status, body = _get(server.url + "/")
    assert status == 200
    assert b"njw_tpu" in body


def test_404(server):
    with pytest.raises(urllib.error.HTTPError):
        _get(server.url + "/nope")
