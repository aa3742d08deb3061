"""Visualization smoke tests: every plot function renders and saves."""
import os

import numpy as np
import pytest

from njw_tpu.viz import (
    animate_simulation, compare_images, plot_energy_history,
    plot_particles_3d, plot_performance, plot_trajectory, show_image,
    show_sinogram, visualize_field, visualize_height, visualize_velocity,
    visualize_vorticity, plot_temperature, create_medical_colormap,
    plot_overlay, plot_slice, plot_orthogonal_slices,
    create_volume_animation, plot_histogram, plot_surface_3d,
    plot_difference, plot_image, plot_ct_projection,
)


RNG = np.random.default_rng(0)
F32 = lambda *s: RNG.standard_normal(s).astype(np.float32)


class TestWeatherViz:
    def test_fields(self, tmp_path):
        for fn, args in [
            (visualize_field, (F32(16, 16),)),
            (visualize_height, (F32(16, 16) + 10,)),
            (visualize_vorticity, (F32(16, 16), F32(16, 16))),
        ]:
            p = str(tmp_path / f"{fn.__name__}.png")
            fn(*args, path=p)
            assert os.path.getsize(p) > 0

    @pytest.mark.parametrize("mode", ["quiver", "streamlines"])
    def test_velocity_modes(self, tmp_path, mode):
        p = str(tmp_path / f"v_{mode}.png")
        visualize_velocity(F32(32, 32), F32(32, 32), mode=mode, path=p)
        assert os.path.getsize(p) > 0

    def test_animation_gif(self, tmp_path):
        snaps = [{"h": F32(8, 8), "step": i} for i in range(3)]
        p = str(tmp_path / "anim.gif")
        animate_simulation(snaps, "h", path=p, fps=2)
        assert os.path.getsize(p) > 0

    def test_performance_plot(self, tmp_path):
        p = str(tmp_path / "perf.png")
        plot_performance({"total_time_ms": 120.0, "steps_per_second": 50.0,
                          "note": "skip-me"}, path=p)
        assert os.path.getsize(p) > 0


class TestParticleViz:
    def test_particles_and_trajectory(self, tmp_path):
        pos = F32(64, 3)
        p1 = str(tmp_path / "p3d.png")
        plot_particles_3d(pos, masses=np.abs(F32(64)) + 0.1, path=p1)
        p2 = str(tmp_path / "traj.png")
        plot_trajectory([pos + 0.1 * i for i in range(4)], path=p2)
        assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0

    def test_energy_history(self, tmp_path):
        p = str(tmp_path / "e.png")
        t = np.linspace(0, 1, 20)
        plot_energy_history(t, {"kinetic": t, "total": t * 0 + 1}, path=p)
        assert os.path.getsize(p) > 0


class TestImagingViz:
    def test_image_sinogram_compare(self, tmp_path):
        img = F32(24, 24)
        for fn, args, name in [
            (show_image, (img,), "img.png"),
            (show_sinogram, (F32(30, 24),), "sino.png"),
            (compare_images, ({"a": img, "b": img * 2},), "cmp.png"),
        ]:
            p = str(tmp_path / name)
            fn(*args, path=p)
            assert os.path.getsize(p) > 0


class TestImagingVizFullSurface:
    """The reference's remaining views (ref: medical-imaging/python/
    medical_imaging/visualization.py:13-399)."""

    def test_overlay_histogram_difference_surface(self, tmp_path):
        img = F32(24, 24)
        seg = (img > 0).astype(np.int32)
        for fn, args, name in [
            (plot_overlay, (img, seg), "ovl.png"),
            (plot_histogram, (img,), "hist.png"),
            (plot_difference, (img, img * 0.5), "diff.png"),
            (plot_surface_3d, (img,), "surf.png"),
        ]:
            p = str(tmp_path / name)
            fn(*args, path=p)
            assert os.path.getsize(p) > 0

    def test_volume_views(self, tmp_path):
        vol = F32(10, 20, 20)
        p1 = str(tmp_path / "slice.png")
        plot_slice(vol, axis=0, path=p1)
        p2 = str(tmp_path / "ortho.png")
        plot_orthogonal_slices(vol, path=p2)
        p3 = str(tmp_path / "anim.gif")
        create_volume_animation(vol[:4], path=p3)
        for p in (p1, p2, p3):
            assert os.path.getsize(p) > 0
        with pytest.raises(ValueError):
            plot_orthogonal_slices(F32(8, 8))

    def test_colormap_and_aliases(self, tmp_path):
        cm = create_medical_colormap()
        assert cm(0.5) is not None
        assert plot_image is show_image
        assert plot_ct_projection is show_sinogram

    def test_md_temperature_plot(self, tmp_path):
        p = str(tmp_path / "temp.png")
        plot_temperature(np.linspace(280, 300, 50), target_temp=295.0,
                         path=p)
        assert os.path.getsize(p) > 0


class TestGeoFinancialViz:
    """ref: integrations/geo_financial/visualization.py:1-575 roles."""

    def test_report_renders_all_views(self, tmp_path):
        import os

        from njw_tpu.geofinancial.geo_risk import (
            GeospatialRiskModel, create_flood_risk_factor,
        )
        from njw_tpu.geofinancial.scenarios import create_climate_scenarios
        from njw_tpu.geofinancial.testdata import (
            generate_assets, generate_dem, generate_returns,
        )
        from njw_tpu.viz.geofinancial import generate_geofin_report

        dem = generate_dem(64, seed=3)
        model = GeospatialRiskModel([create_flood_risk_factor(dem)])
        port = generate_assets(25, extent=64.0, seed=3)
        page = generate_geofin_report(
            str(tmp_path), port, model,
            scenarios=create_climate_scenarios(),
            returns=generate_returns(6, 60, seed=3))
        for f in ("risk_map.png", "portfolio.png", "distribution.png",
                  "scenarios.png", "returns.png", "index.html"):
            assert os.path.exists(tmp_path / f), f
        assert "expected loss" in open(page).read()

    def test_scenario_visualizer(self, tmp_path):
        """ScenarioVisualizer surface (ref: scenario_analysis.py:1034):
        comparison / sensitivity / stress / dashboard views render."""
        import os

        from njw_tpu.geofinancial.geo_risk import (
            GeospatialRiskModel, create_elevation_risk_factor,
            create_flood_risk_factor,
        )
        from njw_tpu.geofinancial.scenarios import (
            ScenarioAnalyzer, create_climate_scenarios,
            create_stress_scenarios,
        )
        from njw_tpu.geofinancial.testdata import (
            generate_assets, generate_dem,
        )
        from njw_tpu.viz.geofinancial import ScenarioVisualizer

        dem = generate_dem(64, seed=5)
        model = GeospatialRiskModel([
            create_flood_risk_factor(dem),
            create_elevation_risk_factor(dem, weight=0.5),
        ])
        port = generate_assets(20, extent=64.0, seed=5)
        viz = ScenarioVisualizer(ScenarioAnalyzer(port, model))
        sset = create_climate_scenarios()
        outs = [
            viz.plot_scenario_comparison(sset, str(tmp_path / "cmp.png")),
            viz.plot_sensitivity_analysis(str(tmp_path / "sens.png")),
            viz.plot_stress_test_results(
                create_stress_scenarios(), str(tmp_path / "stress.png"),
                baseline=sset.scenarios[0]),
            viz.create_scenario_dashboard(sset,
                                          str(tmp_path / "dash.png")),
        ]
        for p in outs:
            assert os.path.exists(p) and os.path.getsize(p) > 1000

    def test_multi_region_visualizer(self, tmp_path):
        """MultiRegionVisualizer surface (ref: multiregion_analysis.py:964):
        risk map / comparison / correlation / allocation / dashboard."""
        import os

        from njw_tpu.geofinancial.geo_risk import (
            GeospatialRiskModel, create_flood_risk_factor,
        )
        from njw_tpu.geofinancial.multiregion import (
            MultiRegionRiskModel, make_region_grid,
        )
        from njw_tpu.geofinancial.testdata import (
            generate_assets, generate_dem,
        )
        from njw_tpu.viz.geofinancial import MultiRegionVisualizer

        dem = generate_dem(64, seed=7)
        port = generate_assets(30, extent=64.0, seed=7)
        mr = MultiRegionRiskModel()
        for region in make_region_grid(0, 64, 0, 64, 2, 2):
            mr.add_region(region, GeospatialRiskModel(
                [create_flood_risk_factor(dem)]))
        viz = MultiRegionVisualizer(mr)
        outs = [
            viz.plot_multi_region_risk_map(port, str(tmp_path / "m.png")),
            viz.plot_region_risk_comparison(port, str(tmp_path / "c.png")),
            viz.plot_risk_correlation_matrix(port,
                                             str(tmp_path / "r.png")),
            viz.plot_recommended_allocation(port, str(tmp_path / "a.png")),
            viz.create_multi_region_dashboard(port,
                                              str(tmp_path / "d.png")),
        ]
        for p in outs:
            assert os.path.exists(p) and os.path.getsize(p) > 1000
