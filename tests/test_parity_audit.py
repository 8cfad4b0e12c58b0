"""Smoke-test the turnkey real-data parity audit (scripts/parity_audit.py).

The script is the last mile for the day the HuPR dataset + released weights
appear; until then nothing in CI would notice it bit-rotting. These tests
drive it end-to-end on the synthetic tiny-geometry assets: the missing-asset
checklist (exit 2), a full audit run producing the JSON report (exit 0), and
the --expected-ap gate (exit 1 on a miss, 0 within tolerance)."""

import importlib.util
import json
import os

import jax
import pytest
import yaml

from hupr_tpu.config import load_config
from tests.test_e2e import make_tiny_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_audit_module():
    spec = importlib.util.spec_from_file_location(
        "parity_audit", os.path.join(REPO, "scripts", "parity_audit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def audit_workdir(tmp_path_factory):
    """One synthetic asset tree shared by every test here: reduced 32x32
    geometry (the dryrun's layout), dataset under data/, config tiny.yaml,
    random-weight model_best.ckpt under logs/tiny/."""
    root = tmp_path_factory.mktemp("audit")
    data_dir = str(root / "data")
    make_tiny_dataset(data_dir, [1], r=32, a=32, img_size=128)
    cfg_path = str(root / "tiny.yaml")
    with open(cfg_path, "w") as fp:
        yaml.safe_dump({
            "DATASET": {"duration": 8, "dataDir": data_dir,
                        "trainName": [1], "valName": [1], "testName": [1],
                        "rangeSize": 32, "azimuthSize": 32,
                        "heatmapSize": 32, "imgSize": 128},
            "MODEL": {"numFilters": 2},
            "TRAINING": {"batchSize": 2, "epochs": 1},
            # classic eval path: one program, cheapest compile for a smoke run
            "TEST": {"batchSize": 2, "sequenceEval": False},
        }, fp)

    from hupr_tpu.engine.checkpoint import save_checkpoint
    from hupr_tpu.engine.steps import init_state
    from hupr_tpu.models import build_model

    cfg = load_config(cfg_path)
    state = init_state(build_model(cfg), cfg, jax.random.PRNGKey(0))
    os.makedirs(root / "logs" / "tiny", exist_ok=True)
    save_checkpoint(str(root / "logs" / "tiny" / "model_best.ckpt"),
                    state, 0, 0.0, cfg.TRAINING.lr)
    return root


def _run_audit(monkeypatch, capsys, workdir, argv):
    monkeypatch.chdir(workdir)
    monkeypatch.setattr("sys.argv", ["parity_audit.py"] + argv)
    rc = _load_audit_module().main()
    return rc, capsys.readouterr().out


def test_missing_assets_prints_checklist(monkeypatch, capsys, audit_workdir):
    # an empty log dir: weights missing -> exit 2 with an actionable list
    rc, out = _run_audit(monkeypatch, capsys, audit_workdir,
                         ["--config", "tiny.yaml", "--dir", "nonexistent"])
    assert rc == 2
    assert "parity audit blocked" in out
    assert "model_best" in out


def test_missing_dataset_prints_checklist(monkeypatch, capsys, audit_workdir,
                                          tmp_path):
    # config pointing at an empty dataDir: every asset class is reported
    cfg_path = str(tmp_path / "empty.yaml")
    with open(cfg_path, "w") as fp:
        yaml.safe_dump({"DATASET": {"duration": 8,
                                    "dataDir": str(tmp_path / "nodata"),
                                    "trainName": [1], "valName": [1],
                                    "testName": [1]}}, fp)
    rc, out = _run_audit(monkeypatch, capsys, audit_workdir,
                         ["--config", cfg_path, "--dir", "nonexistent"])
    assert rc == 2
    assert "annotation file" in out
    assert "sequence dir" in out
    assert "weights" in out


def test_audit_runs_and_reports(monkeypatch, capsys, audit_workdir):
    rc, out = _run_audit(monkeypatch, capsys, audit_workdir,
                         ["--config", "tiny.yaml", "--dir", "tiny",
                          "--split", "test"])
    assert rc == 0
    report = json.loads(out.strip().splitlines()[-1])
    assert report["split"] == "test"
    assert set(report) >= {"AP", "AP50", "AP75", "AR", "checkpoint_dir"}
    for k in ("AP", "AP50", "AP75", "AR"):
        assert 0.0 <= report[k] <= 1.0 or report[k] == -1.0
    assert os.path.exists(audit_workdir / "logs" / "tiny"
                          / "test_results.json")
    # stash the measured AP for the gate tests (same module-scoped assets)
    audit_workdir.joinpath("measured_ap.txt").write_text(str(report["AP"]))


def test_audit_val_split(monkeypatch, capsys, audit_workdir):
    # --split val is the script's documented primary invocation: evalPhase
    # overrides the reference's eval->test pairing, so write_keypoints must
    # name the file from the dataset phase (val_results.json), or the
    # evaluator crashes / silently scores a stale file (ADVICE r4 high)
    stale = audit_workdir / "logs" / "tiny" / "val_results.json"
    if stale.exists():
        stale.unlink()
    rc, out = _run_audit(monkeypatch, capsys, audit_workdir,
                         ["--config", "tiny.yaml", "--dir", "tiny",
                          "--split", "val"])
    assert rc == 0
    report = json.loads(out.strip().splitlines()[-1])
    assert report["split"] == "val"
    assert os.path.exists(stale)


def test_expected_ap_gate(monkeypatch, capsys, audit_workdir):
    ap_file = audit_workdir / "measured_ap.txt"
    if not ap_file.exists():  # ordering guard; pytest runs file-order anyway
        pytest.skip("audit run test did not produce a measured AP")
    ap = float(ap_file.read_text())

    # far-off expectation -> exit 1, delta recorded
    rc, out = _run_audit(monkeypatch, capsys, audit_workdir,
                         ["--config", "tiny.yaml", "--dir", "tiny",
                          "--split", "test",
                          "--expected-ap", str(ap + 0.5)])
    assert rc == 1
    report = json.loads(out.strip().splitlines()[-1])
    assert report["within_tolerance"] is False
    assert report["delta"] == pytest.approx(-0.5, abs=1e-6)

    # matching expectation -> exit 0
    rc, out = _run_audit(monkeypatch, capsys, audit_workdir,
                         ["--config", "tiny.yaml", "--dir", "tiny",
                          "--split", "test", "--expected-ap", str(ap),
                          "--tolerance", "0.005"])
    assert rc == 0
    report = json.loads(out.strip().splitlines()[-1])
    assert report["within_tolerance"] is True
