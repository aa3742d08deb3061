"""Geospatial tests (mirrors ref python/tests/test_{dem,point_cloud}.py +
integration_tests/test_end_to_end.py flow)."""
import numpy as np
import pytest

import jax.numpy as jnp

from njw_tpu.geospatial import (
    DEMProcessor, GeoTransform, PointCloud, classify_ground, compute_normals,
    cost_distance, dem_statistics, extract_buildings, fill_sinks,
    flow_accumulation, flow_direction, least_cost_path, rasterize_dem,
    resample, terrain_derivatives, viewshed,
)
from njw_tpu.geospatial.point_cloud import PointClass


def synthetic_dem(n=64, seed=0):
    """Smooth hills + a central peak."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n] / n
    z = (20 * np.exp(-((yy - 0.5) ** 2 + (xx - 0.5) ** 2) / 0.05)
         + 5 * np.sin(4 * np.pi * xx) * np.cos(3 * np.pi * yy))
    return z.astype(np.float32)


class TestGeoTransform:
    def test_roundtrip(self):
        gt = GeoTransform(origin_x=1000.0, origin_y=2000.0,
                          pixel_width=5.0, pixel_height=-5.0)
        x, y = gt.pixel_to_geo(10, 20)
        assert (x, y) == (1100.0, 1950.0)
        row, col = gt.geo_to_pixel(x, y)
        assert (round(row), round(col)) == (10, 20)


class TestTerrain:
    def test_flat_dem_zero_slope(self):
        d = terrain_derivatives(np.full((16, 16), 5.0, np.float32))
        np.testing.assert_allclose(np.asarray(d["slope"]), 0.0, atol=1e-6)

    def test_inclined_plane_slope(self):
        yy, xx = np.mgrid[0:32, 0:32]
        plane = (xx * 1.0).astype(np.float32)  # dz/dx = 1 -> slope 45 deg
        d = terrain_derivatives(plane, cell_size=1.0)
        interior = np.asarray(d["slope"])[2:-2, 2:-2]
        np.testing.assert_allclose(interior, np.pi / 4, atol=1e-3)
        # aspect points along +x gradient direction
        assert abs(float(np.asarray(d["aspect"])[16, 16])) < 1e-3

    def test_peak_has_negative_curvature(self):
        dem = synthetic_dem()
        d = terrain_derivatives(dem)
        assert float(np.asarray(d["curvature"])[32, 32]) < 0


class TestViewshed:
    def test_wall_blocks_view(self):
        dem = np.zeros((32, 32), np.float32)
        dem[:, 16] = 50.0  # tall north-south wall
        vis = np.asarray(viewshed(dem, (16, 4), observer_height=2.0))
        assert vis[16, 4]          # observer sees itself
        assert vis[16, 10]         # same side: visible
        assert not vis[16, 28]     # behind the wall: hidden

    def test_flat_dem_all_visible(self):
        dem = np.zeros((24, 24), np.float32)
        vis = np.asarray(viewshed(dem, (12, 12), observer_height=2.0))
        assert vis.mean() > 0.99


class TestHydrology:
    def test_fill_sinks_removes_pit(self):
        dem = synthetic_dem(32)
        dem[10, 10] -= 30.0  # artificial pit
        filled = np.asarray(fill_sinks(dem, n_iterations=128))
        assert filled[10, 10] > dem[10, 10] + 10.0
        # non-pit cells barely change
        assert abs(filled[0, 0] - dem[0, 0]) < 1e-3

    def test_flow_direction_points_downhill(self):
        yy, xx = np.mgrid[0:16, 0:16]
        plane = (xx * 1.0).astype(np.float32)  # slopes down toward -x
        fdir = np.asarray(flow_direction(plane))
        # direction index 6 = (0, -1) (west) for interior cells
        assert (fdir[4:-4, 4:-4] == 6).all()

    def test_flow_accumulation_on_valley(self):
        """A V-shaped valley: accumulation concentrates along the axis."""
        yy, xx = np.mgrid[0:32, 0:32]
        dem = (np.abs(xx - 16) * 2.0 + (31 - yy) * 0.5).astype(np.float32)
        acc = np.asarray(flow_accumulation(dem, n_iterations=64))
        assert acc[-1, 16] > 10 * acc[-1, 4]


def _dijkstra_oracle(cost, source):
    """Exact D8 shortest path with edge cost hypot*(c_a+c_b)/2."""
    import heapq

    h, w = cost.shape
    dist = np.full((h, w), np.inf)
    dist[source] = 0.0
    pq = [(0.0, source)]
    offs = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1),
            (-1, -1)]
    while pq:
        d, (y, x) = heapq.heappop(pq)
        if d > dist[y, x]:
            continue
        for dy, dx in offs:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w:
                nd = d + np.hypot(dy, dx) * 0.5 * (cost[y, x]
                                                   + cost[ny, nx])
                if nd < dist[ny, nx] - 1e-9:
                    dist[ny, nx] = nd
                    heapq.heappush(pq, (nd, (ny, nx)))
    return dist


class TestSweepOracles:
    """The fast-sweeping rewrites must hit the same fixed points as the
    relaxation definitions (ref: dem_kernels.cu:276-356 and the
    least-cost capability, dem_processing.hpp:83)."""

    def test_cost_distance_matches_dijkstra(self):
        rng = np.random.default_rng(12)
        cost = (0.2 + rng.random((24, 24))).astype(np.float32)
        cost[5:20, 12] = 25.0  # wall with a detour
        d = np.asarray(cost_distance(cost, (3, 3), n_iterations=64))
        ref = _dijkstra_oracle(cost.astype(np.float64), (3, 3))
        np.testing.assert_allclose(d, ref, rtol=2e-5, atol=1e-4)

    def test_fill_sinks_matches_jacobi_fixed_point(self):
        dem = synthetic_dem(32, seed=4)
        dem[8:11, 8:11] -= 25.0  # 3x3 depression
        eps = 1e-3
        # NumPy Jacobi oracle: iterate the reference recurrence to fixity
        z = dem.astype(np.float64)
        wv = np.full_like(z, 1e30)
        wv[0, :], wv[-1, :], wv[:, 0], wv[:, -1] = (z[0, :], z[-1, :],
                                                    z[:, 0], z[:, -1])
        for _ in range(10000):
            p = np.pad(wv, 1, constant_values=1e30)
            mn = np.min([p[1 + dy:1 + dy + 32, 1 + dx:1 + dx + 32]
                         for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                         if (dy, dx) != (0, 0)], axis=0)
            new = np.minimum(wv, np.maximum(z, mn + eps))
            if np.abs(new - wv).max() < eps * 1e-4:
                wv = new
                break
            wv = new
        filled = np.asarray(fill_sinks(dem, n_iterations=64, epsilon=eps))
        np.testing.assert_allclose(filled, wv, atol=5e-3)

    def test_flow_push_matches_doubling(self):
        """The gather-free masked-roll push is bit-identical to the
        pointer-doubling path (same forest, same drain semantics)."""
        dem = synthetic_dem(48, seed=5)
        a = np.asarray(flow_accumulation(dem))
        b = np.asarray(flow_accumulation(dem, method="push"))
        np.testing.assert_array_equal(a, b)

    def test_flow_accumulation_matches_topological_sum(self):
        dem = synthetic_dem(24, seed=7)
        acc = np.asarray(flow_accumulation(dem))
        fdir = np.asarray(flow_direction(dem))
        offs = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1),
                (0, -1), (-1, -1)]
        # oracle: push in decreasing-elevation order (D8 flows downhill)
        ref = np.ones((24, 24))
        order = np.argsort(-dem, axis=None)
        for flat in order:
            y, x = divmod(int(flat), 24)
            d = int(fdir[y, x])
            if d >= 0:
                ny, nx = y + offs[d][0], x + offs[d][1]
                if 0 <= ny < 24 and 0 <= nx < 24:
                    ref[ny, nx] += ref[y, x]
        np.testing.assert_allclose(acc, ref, rtol=1e-6)


class TestLeastCost:
    def test_cost_distance_prefers_cheap_cells(self):
        cost = np.ones((16, 16), np.float32)
        cost[:, 8] = 100.0  # expensive wall column
        cost[0, 8] = 1.0    # gap at the top
        d = np.asarray(cost_distance(cost, (8, 2), n_iterations=128))
        # crossing at the gap is cheaper than straight through the wall
        assert d[8, 14] < 100.0

    def test_path_connects_endpoints(self):
        dem = synthetic_dem(32)
        proc = DEMProcessor(dem)
        path = proc.least_cost_path((2, 2), (28, 28), n_iterations=256)
        assert path[0] == (2, 2) and path[-1] == (28, 28)
        # consecutive steps are 8-neighbors
        for (y0, x0), (y1, x1) in zip(path, path[1:]):
            assert max(abs(y1 - y0), abs(x1 - x0)) == 1


class TestResampleStats:
    def test_resample_shapes_and_values(self):
        dem = synthetic_dem(32)
        up = np.asarray(resample(dem, 63, 63))
        assert up.shape == (63, 63)
        # 63 = 2*32-1 -> even output indices land exactly on input cells
        np.testing.assert_allclose(up[::2, ::2], dem, atol=1e-4)
        nn = np.asarray(resample(dem, 16, 16, method="nearest"))
        assert nn.shape == (16, 16)

    def test_statistics_keys(self):
        st = dem_statistics(synthetic_dem())
        assert set(st) == {"min", "max", "mean", "std", "mean_slope"}
        assert st["max"] > st["min"]


class TestPointCloud:
    def _scene(self, seed=0):
        """Flat ground + a 10 m flat-roofed building + scattered trees."""
        rng = np.random.default_rng(seed)
        ground = np.stack([
            rng.uniform(0, 50, 4000), rng.uniform(0, 50, 4000),
            rng.normal(0.0, 0.05, 4000)], axis=1)
        bx, by = rng.uniform(20, 30, 800), rng.uniform(20, 30, 800)
        building = np.stack([bx, by, np.full(800, 10.0)
                             + rng.normal(0, 0.05, 800)], axis=1)
        tx, ty = rng.uniform(5, 10, 200), rng.uniform(35, 45, 200)
        trees = np.stack([tx, ty, rng.uniform(3, 8, 200)], axis=1)
        return PointCloud(np.concatenate([ground, building, trees]))

    def test_rasterize_min_max(self):
        pc = self._scene()
        dem, origin = rasterize_dem(pc, 2.0, "min")
        dsm, _ = rasterize_dem(pc, 2.0, "max")
        dem, dsm = np.asarray(dem), np.asarray(dsm)
        m = np.isfinite(dem) & np.isfinite(dsm)
        assert (dsm[m] >= dem[m] - 1e-5).all()

    def test_classify_ground(self):
        pc = self._scene()
        out = classify_ground(pc, cell_size=2.0)
        ground_mask = out.classification == PointClass.GROUND
        # the flat ground points (first 4000) should mostly be GROUND
        assert ground_mask[:4000].mean() > 0.9
        # building roof points should NOT be ground
        assert ground_mask[4000:4800].mean() < 0.1

    def test_extract_buildings(self):
        pc = classify_ground(self._scene(), cell_size=2.0)
        out = extract_buildings(pc, cell_size=2.0, min_height=3.0)
        b = out.classification == PointClass.BUILDING
        assert b[4000:4800].mean() > 0.7      # roof points marked
        assert b[:4000].mean() < 0.05         # ground not marked

    def test_normals_flat_ground_point_up(self):
        pc = self._scene()
        n = compute_normals(pc, cell_size=2.0)
        nz_ground = n[:4000, 2]
        assert (nz_ground > 0.9).mean() > 0.85


class TestGeospatialMetrics:
    """ref: benchmark/metrics.py:20-260 GeospatialMetrics roles."""

    def test_series_and_averages(self):
        from njw_tpu.geospatial.metrics import GeospatialMetrics

        m = GeospatialMetrics()
        m.record_metric("x", 1.0)
        m.record_metric("x", 3.0)
        assert m.get_latest_metric("x") == 3.0
        assert m.get_average_metric("x") == 2.0
        assert m.get_metric("missing") == []

    def test_throughput_records(self):
        from njw_tpu.geospatial.metrics import GeospatialMetrics

        m = GeospatialMetrics()
        tp = m.record_viewshed_performance(512, 512, 0.5)
        assert tp == pytest.approx(512 * 512 / 0.5)
        tp2 = m.record_point_classification_performance(10000, 0.1)
        assert tp2 == pytest.approx(1e5)
        assert "viewshed_throughput_cells_per_s" in m.summary()

    def test_accuracy_metrics(self):
        import numpy as np

        from njw_tpu.geospatial.metrics import (
            classification_scores, raster_rmse, viewshed_agreement,
        )

        a = np.zeros((4, 4))
        b = np.ones((4, 4))
        assert raster_rmse(a, b) == pytest.approx(1.0)
        assert viewshed_agreement([1, 0, 1], [1, 0, 0]) == pytest.approx(2 / 3)
        scores = classification_scores([0, 0, 1, 1], [0, 1, 1, 1])
        assert scores[1]["precision"] == 1.0
        assert scores[1]["recall"] == pytest.approx(2 / 3)


class TestGeospatialViz:
    """ref: benchmark/visualization.py:42-1050 view roles."""

    def test_report_renders_all_views(self, tmp_path):
        import numpy as np

        from njw_tpu.geospatial.datasets import synthetic_dem
        from njw_tpu.viz.geospatial import generate_geospatial_report

        dem = synthetic_dem(64, seed=1)
        rng = np.random.default_rng(0)
        visible = rng.random((64, 64)) > 0.5
        slope = np.abs(np.gradient(dem)[0])
        aspect = np.arctan2(*np.gradient(dem))
        flow = rng.random((64, 64)) * 100
        pts = rng.random((500, 3)) * 64
        page = generate_geospatial_report(
            str(tmp_path), dem, visible=visible, observer_xy=(32, 32),
            slope=slope, aspect=aspect, flow_acc=flow, points=pts,
            metrics={"viewshed_cells_per_s": 1e8})
        import os

        for f in ("dem.png", "terrain3d.png", "viewshed.png",
                  "derivatives.png", "flow.png", "points.png",
                  "index.html"):
            assert os.path.exists(tmp_path / f), f
        assert "viewshed_cells_per_s" in open(page).read()

    def test_hillshade_range(self):
        from njw_tpu.geospatial.datasets import synthetic_dem
        from njw_tpu.viz.geospatial import hillshade

        hs = hillshade(synthetic_dem(32, seed=2))
        assert hs.min() >= 0.0 and hs.max() <= 1.0
