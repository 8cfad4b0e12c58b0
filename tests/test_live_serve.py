"""Smoke-test scripts/live_serve.py end-to-end on loopback (synthetic mode).

The live topology (UDP capture -> reassembly -> streaming pose) was only
ever driven by hand; this pins the script surface itself: argument parsing,
config-driven RadarParams, the compile-before-packets warmup, index-aligned
view pairing, and the final stats report — at the reduced 32x32 geometry
(same layout as tests/test_streaming.py, so programs share the compile
cache)."""

import importlib.util
import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_live_serve_synthetic_loopback(monkeypatch, capsys, tmp_path):
    cfg_path = str(tmp_path / "tiny_live.yaml")
    with open(cfg_path, "w") as fp:
        yaml.safe_dump({
            "DATASET": {"rangeSize": 32, "azimuthSize": 32,
                        "heatmapSize": 32, "imgSize": 128,
                        "numChirps": 8,
                        "adcParams": {"num_adc_samples": 128,
                                      "num_chirp": 48,
                                      "idx_proc_chirp": 16,
                                      "num_group_chirp": 2}},
            "MODEL": {"numFilters": 2, "attention": "pallas"},
        }, fp)

    spec = importlib.util.spec_from_file_location(
        "live_serve", os.path.join(REPO, "scripts", "live_serve.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    frames = 4
    monkeypatch.setattr("sys.argv", [
        "live_serve.py", "--config", cfg_path, "--synthetic",
        "--frames", str(frames), "--platform", "cpu"])
    mod.main()
    out = capsys.readouterr().out

    # the cpu-platform downgrade must have fired (pallas doesn't lower here)
    assert "pallas -> xla" in out
    assert f"served {frames} frames" in out
    # every frame arrived and aligned: no early end, no resync skips
    assert "capture ended early" not in out
    assert "resync:" not in out
    # both reassemblers saw the full byte stream (kernel drops would show
    # up as missing bytes; the sender paces to avoid them)
    import re
    stats = re.findall(r"'bytes': (\d+)", out)
    assert len(stats) == 2
    rp_bytes = frames * 4 * 48 * 128 * 2 * 2   # F x RX x chirps x ADC x IQ x s16
    assert [int(s) for s in stats] == [rp_bytes, rp_bytes]
