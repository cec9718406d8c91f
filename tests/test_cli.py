"""CLI smoke tests: the reference-parity surfaces end-to-end (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_track_json(tmp_path_factory):
    """Small synthetic closed track so CLI runs stay fast."""
    th = np.linspace(0, 2 * np.pi, 25)
    r_mid = 30.0 + 6.0 * np.sin(3 * th)
    data = {
        "name": "tinyring",
        "left": {
            "x": ((r_mid - 2.5) * np.cos(th)).tolist(),
            "y": ((r_mid - 2.5) * np.sin(th)).tolist(),
        },
        "right": {
            "x": ((r_mid + 2.5) * np.cos(th)).tolist(),
            "y": ((r_mid + 2.5) * np.sin(th)).tolist(),
        },
    }
    for side in ("left", "right"):
        data[side]["x"][-1] = data[side]["x"][0]
        data[side]["y"][-1] = data[side]["y"][0]
    p = tmp_path_factory.mktemp("tracks") / "tinyring.json"
    p.write_text(json.dumps(data))
    return str(p)


@pytest.fixture(scope="module")
def tbr18_path():
    p = "/root/reference/data/vehicles/tbr18.json"
    if not os.path.isfile(p):
        pytest.skip("reference vehicle data not available")
    return p


class TestRaceCLI:
    def _run(self, tiny_track_json, tbr18_path, tmp_path, *flags):
        from lap_time_optimization_tpu.cli import race

        return race.main(
            [tiny_track_json, tbr18_path, "0.8", *flags, "--output-dir", str(tmp_path)]
        )

    def test_curvature_end_to_end(self, tiny_track_json, tbr18_path, tmp_path):
        out = self._run(tiny_track_json, tbr18_path, tmp_path, "--curvature", "--plot-all")
        assert out["lap_time"] > 0 and out["length"] > 0
        d = out["artifact_dir"]
        for name in ("path", "left", "right", "widths", "velocities"):
            assert os.path.isfile(os.path.join(d, f"{name}.json")), name
        for png in ("path", "corners", "trajectory"):
            assert os.path.isfile(os.path.join(d, f"{png}.png")), png
        # artifact schema round-trips through the NMPC-stage loader
        from lap_time_optimization_tpu.utils import io

        x, y = io.load_artifact(os.path.join(d, "path.json"))
        assert len(x) == len(y) > 50
        v = io.load_artifact(os.path.join(d, "velocities.json"))
        assert np.all(v > 0)

    def test_estimated(self, tiny_track_json, tbr18_path, tmp_path):
        out = self._run(tiny_track_json, tbr18_path, tmp_path, "--estimated")
        assert out["lap_time"] > 0

    def test_nonlinear(self, tiny_track_json, tbr18_path, tmp_path):
        out = self._run(tiny_track_json, tbr18_path, tmp_path, "--nonlinear")
        assert out["lap_time"] > 0

    def test_rejects_unknown_track(self, tbr18_path):
        from lap_time_optimization_tpu.cli import race

        with pytest.raises(FileNotFoundError):
            race.main(["nosuch.json", tbr18_path, "0.8", "--curvature"])

    def test_requires_method(self, tiny_track_json, tbr18_path):
        from lap_time_optimization_tpu.cli import race

        with pytest.raises(SystemExit):
            race.main([tiny_track_json, tbr18_path, "0.8"])


@pytest.fixture(scope="module")
def ref_artifacts():
    d = "/root/reference/data/plots/MX-5/buckmore/curvature"
    if not os.path.isdir(d):
        pytest.skip("reference artifacts not available")
    return d


class TestMPCCLI:
    def test_short_sim(self, tmp_path, ref_artifacts):
        from lap_time_optimization_tpu.cli import mpc as mpc_cli

        out_json = str(tmp_path / "sim.json")
        res = mpc_cli.main(["--curvature", "--steps", "5", "--output", out_json])
        data = json.load(open(out_json))
        assert set(data.keys()) == {"x", "y", "u", "Fy", "alpha"}
        assert np.asarray(data["x"]).shape == (6, 8, 1)
        s = np.asarray(res.xs)[:, 0]
        assert s[-1] > s[0]


class TestShowResultsCLI:
    def test_plots_internals(self, tmp_path, ref_artifacts):
        from lap_time_optimization_tpu.cli import mpc as mpc_cli
        from lap_time_optimization_tpu.cli import show_results

        sim_json = str(tmp_path / "sim.json")
        mpc_cli.main(["--curvature", "--steps", "3", "--output", sim_json])
        out_png = str(tmp_path / "internals.png")
        show_results.main([sim_json, "--method", "curvature", "--out", out_png])
        assert os.path.isfile(out_png) and os.path.getsize(out_png) > 10_000
