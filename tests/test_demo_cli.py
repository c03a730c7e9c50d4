"""tools/demo.py smoke: raw .bin scans -> full model + NMS -> printed
detections (parity: reference tools/demo.py flow), mini config, CPU."""
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.test_cli_roundtrip import write_mini_cfg
from tests.test_kitti_pipeline import make_kitti_root

pytestmark = pytest.mark.slow
REPO = Path(__file__).resolve().parent.parent


def test_demo_cli(tmp_path, monkeypatch, capfd):
    root, _ = make_kitti_root(tmp_path, n_frames=2)
    cfg_path = write_mini_cfg(tmp_path, root)

    scans = tmp_path / "scans"
    scans.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        pts = np.zeros((2048, 4), np.float32)
        pts[:, 0] = rng.uniform(0, 30, 2048)
        pts[:, 1] = rng.uniform(-15, 15, 2048)
        pts[:, 2] = rng.uniform(-2, 0.5, 2048)
        # a car-ish cluster so something can fire
        pts[:200, 0] = rng.uniform(9, 13, 200)
        pts[:200, 1] = rng.uniform(-1, 1, 200)
        pts[:200, 2] = rng.uniform(-1.6, -0.2, 200)
        pts.tofile(scans / f"{i:06d}.bin")

    sys.path.insert(0, str(REPO / "tools"))
    import demo as demo_cli

    monkeypatch.setattr(
        sys, "argv",
        ["demo.py", "--cfg_file", str(cfg_path),
         "--data_path", str(scans), "--ext", ".bin"],
    )
    demo_cli.main()
    err = capfd.readouterr().err  # fd-level: logger handlers may hold a pre-capsys stderr
    assert "Total number of samples: \t2" in err
    assert err.count("detections") == 2
    assert "Demo done." in err
