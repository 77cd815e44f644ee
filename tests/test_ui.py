"""Web training UI end-to-end over HTTP (no display needed) —
the GUI row of SURVEY §2.15, re-designed as a web app
(onetrainer_tpu/ui/server.py; reference: modules/ui/TrainUI.py:44-666)."""

import json
import time
import urllib.request

import pytest

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.ui.server import TrainUIServer
from tests.test_data import make_dataset
from tests.test_trainer import tiny_train_config, write_tiny_checkpoint
from tests.test_train_step import tiny_sd_model


def _req(port, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    with urllib.request.urlopen(url, data=data, timeout=30) as r:
        ctype = r.headers.get("Content-Type", "")
        raw = r.read()
    return json.loads(raw) if "json" in ctype else raw


@pytest.fixture()
def server():
    s = TrainUIServer(port=0)
    s.serve_background()
    yield s
    s.shutdown()


def test_ui_page_and_config_roundtrip(server):
    page = _req(server.port, "/")
    assert b"onetrainer-tpu" in page and b"start training" in page

    cfg = _req(server.port, "/api/config")
    assert "model_type" in cfg and "concepts" in cfg

    r = _req(server.port, "/api/config", {"batch_size": 7, "epochs": 3})
    assert r["ok"]
    cfg = _req(server.port, "/api/config")
    assert cfg["batch_size"] == 7 and cfg["epochs"] == 3


def test_ui_preset_listing(tmp_path):
    preset = {"__version": 6, "batch_size": 5}
    (tmp_path / "my preset.json").write_text(json.dumps(preset))
    s = TrainUIServer(port=0, presets_dir=str(tmp_path))
    s.serve_background()
    try:
        names = _req(s.port, "/api/presets")["presets"]
        assert "my preset.json" in names
        r = _req(s.port, "/api/preset/load", {"name": "my preset.json"})
        assert r["ok"]
        assert _req(s.port, "/api/config")["batch_size"] == 5
    finally:
        s.shutdown()


def test_ui_runs_training_end_to_end(tmp_path):
    """Start button -> training thread -> done state -> output model on
    disk, with progress/status/loss visible through /api/status (the
    reference's __training_thread_function contract)."""
    import os

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    model = tiny_sd_model()
    write_tiny_checkpoint(base, model)
    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    config.epochs = 1
    config.backup_before_save = False

    s = TrainUIServer(port=0, config=config)
    s.serve_background()
    try:
        r = _req(s.port, "/api/train/start", {})
        assert r["ok"]
        # double-start is rejected while running
        r2 = _req(s.port, "/api/train/start", {})
        assert not r2["ok"]
        deadline = time.time() + 600
        status = {}
        while time.time() < deadline:
            status = _req(s.port, "/api/status")
            if status["state"] in ("done", "error"):
                break
            time.sleep(2)
        assert status["state"] == "done", status
        assert status["progress"]["global_step"] >= 2
        assert os.path.exists(config.output_model_destination)
    finally:
        s.shutdown()


def test_ui_stop_command(tmp_path):
    import os

    base = str(tmp_path / "ckpt")
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    write_tiny_checkpoint(base, tiny_sd_model())
    config = tiny_train_config(base, ds, str(tmp_path / "ws"),
                               str(tmp_path / "cache"))
    config.epochs = 50   # long enough that stop lands mid-run
    config.backup_before_save = False

    s = TrainUIServer(port=0, config=config)
    s.serve_background()
    try:
        assert _req(s.port, "/api/train/start", {})["ok"]
        # wait for actual stepping, then stop
        deadline = time.time() + 600
        while time.time() < deadline:
            st = _req(s.port, "/api/status")
            if st["progress"]["global_step"] >= 1:
                break
            time.sleep(1)
        _req(s.port, "/api/train/stop", {})
        while time.time() < deadline:
            st = _req(s.port, "/api/status")
            if st["state"] in ("done", "error"):
                break
            time.sleep(1)
        assert st["state"] == "done", st
        # the reference saves on stop; output model exists
        assert os.path.exists(config.output_model_destination)
    finally:
        s.shutdown()
