"""Interactive HTML viewer export (showmotion.m analogue, viz/html_viewer)."""

import json
import re

import numpy as np

from landing_controller_tpu.viz import export_html


def test_export_html_self_contained(tmp_path):
    N = 21
    X = np.zeros((N, 12))
    X[:, 2] = np.linspace(0.6, 0.28, N)
    U = np.zeros((N - 1, 24))
    U[:, 14::3] = 25.0
    dt = np.concatenate([[0.05], np.full(15, 0.02), [0.05, 0.05, 0.1, 0.2]])
    p = export_html(str(tmp_path / "v.html"), X, U, dt)
    html = open(p).read()
    # self-contained: no external resources, data baked in
    assert "__DATA__" not in html
    assert "http://" not in html and "https://" not in html
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert len(data["t"]) == N and len(data["X"]) == N and len(data["U"]) == N - 1
    np.testing.assert_allclose(data["t"][-1], float(dt.sum()), atol=1e-5)
    # interaction handlers present (orbit, zoom, scrub, play)
    for token in ("onmousedown", "onwheel", "getElementById('t')", "play"):
        assert token in html
