"""The turnkey parity gate's preflight and table plumbing (tools/parity_gate.py).

The gate itself needs ShapeNet-Part + reference .pth files (absent here);
these tests pin the parts that must not rot: input preflight, metric-line
parsing, and the category -> config wiring.
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def gate():
    spec = importlib.util.spec_from_file_location(
        "parity_gate", os.path.join(REPO, "tools", "parity_gate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_preflight_names_every_missing_input(gate, tmp_path):
    problems = gate.preflight(
        ["chair", "car"], str(tmp_path / "nodata"), str(tmp_path / "nopth")
    )
    text = "\n".join(problems)
    assert "nodata" in text
    assert "chair.pth" in text and "car.pth" in text


def test_preflight_ok_with_inputs(gate, tmp_path):
    data = tmp_path / "shapenet_part"
    (data / "train_test_split").mkdir(parents=True)
    pre = tmp_path / "pretrained"
    pre.mkdir()
    (pre / "chair.pth").write_bytes(b"x")
    assert gate.preflight(["chair"], str(data), str(pre)) == []


def test_category_configs_exist_and_resume_pretrained(gate):
    from difffacto_tpu.config import Config

    for cat in gate.CATS:
        path = os.path.join(REPO, "configs", f"gen_{cat}.py")
        assert os.path.exists(path), path
        cfg = Config(path)
        assert cfg.resume_path == f"pretrained/{cat}.pth", (cat, cfg.resume_path)


def test_metric_line_parsing(gate):
    import re

    lines = [
        "1-NN-CD-acc: 0.674",
        "lgan_mmd-CD: 5.03e-03",
        "not a metric line",
        "gen_fixed0000/whatever: nan",
    ]
    metrics = {}
    for line in lines:
        m = re.match(r"^([\w./-]+):\s+(-?[\d.eE+-]+)$", line.strip())
        if m:
            try:
                metrics[m.group(1)] = float(m.group(2))
            except ValueError:
                pass
    assert metrics["1-NN-CD-acc"] == 0.674
    assert abs(metrics["lgan_mmd-CD"] - 0.00503) < 1e-9
    assert "not a metric line" not in metrics
