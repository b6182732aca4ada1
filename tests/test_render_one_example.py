"""Smoke test for examples/render_one.py — the single-render driver
(reference mitsuba3/run_render.py + debug.py capability, SURVEY §2.2 #16).
Runs the full demo flow at tiny geometry: synthetic debug volume, two-view
radiance render, per-view PDFs, 3-D scene-geometry plot, and the
homography alignment check.
"""

import os
import runpy
import sys


def test_render_one_demo_produces_figures(tmp_path, monkeypatch):
    out = tmp_path / "render_one_out"
    script = os.path.join(os.path.dirname(__file__), os.pardir,
                          "examples", "render_one.py")
    monkeypatch.setattr(sys, "argv", [
        "render_one.py", "--out-dir", str(out),
        "--res", "24", "--width", "24", "--depth", "12",
        "--fov", "0.01"])
    runpy.run_path(script, run_name="__main__")

    assert (out / "view_0.pdf").stat().st_size > 0
    assert (out / "view_1.pdf").stat().st_size > 0
    assert (out / "scene_geometry.pdf").stat().st_size > 0
    assert (out / "alignment_check.pdf").stat().st_size > 0
    assert (out / "overpass_synth.csv").stat().st_size > 0
