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

    # the structured samples/embeddings list editors append partial
    # dicts; from_dict must normalize them to full defaulted configs
    # (reference: SamplingTab/AdditionalEmbeddingsTab ConfigLists)
    r = _req(server.port, "/api/config",
             {"samples": [{"prompt": "a cat"}, {}],
              "additional_embeddings": [{}]})
    assert r["ok"]
    cfg = _req(server.port, "/api/config")
    assert cfg["samples"][0]["prompt"] == "a cat"
    assert cfg["samples"][0]["cfg_scale"] == 7.0       # defaulted
    assert cfg["samples"][1]["diffusion_steps"] == 20  # fully defaulted
    assert "token_count" in cfg["additional_embeddings"][0] or \
        "placeholder" in cfg["additional_embeddings"][0]


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


def test_ui_dataset_editor_and_mask_tool(tmp_path, monkeypatch):
    """Dataset caption editor + batch masking over HTTP (reference:
    CaptionUI / GenerateMasksWindow). The mask tool uses MaskByColor so
    the test stays offline; captioning is exercised through a stub model
    (the real BLIP path needs HF downloads)."""
    import numpy as np
    from PIL import Image

    from onetrainer_tpu.ui import server as srv

    ds = tmp_path / "ds"
    ds.mkdir()
    for i in range(3):
        arr = np.full((16, 16, 3), 255 if i == 0 else 10, np.uint8)
        Image.fromarray(arr).save(ds / f"img{i}.png")
    (ds / "img1.txt").write_text("existing caption")

    s = TrainUIServer(port=0)
    s.serve_background()
    try:
        # browse
        rows = _req(s.port, f"/api/dataset?dir={ds}")["images"]
        assert [r["name"] for r in rows] == ["img0.png", "img1.png",
                                             "img2.png"]
        assert rows[1]["caption"] == "existing caption"
        assert not rows[0]["has_mask"]
        img = _req(s.port, f"/dataset/image?dir={ds}&name=img0.png")
        assert img[:8] == b"\x89PNG\r\n\x1a\n"

        # edit a caption
        r = _req(s.port, "/api/dataset/caption",
                 {"dir": str(ds), "name": "img2.png", "caption": "a thing"})
        assert r["ok"]
        assert (ds / "img2.txt").read_text() == "a thing"

        # batch mask with the color model (white pixels -> mask)
        r = _req(s.port, "/api/tools/mask",
                 {"dir": str(ds), "model": "color", "color": [255, 255, 255],
                  "distance": 10, "expand_pixels": 0, "smooth_pixels": 0})
        assert r["ok"]
        deadline = time.time() + 60
        while time.time() < deadline:
            st = _req(s.port, "/api/tools/status")
            if not st["running"]:
                break
            time.sleep(0.2)
        assert st["error"] == "", st
        assert st["done"] == 3
        mask = np.asarray(Image.open(ds / "img0-masklabel.png"))
        assert mask.max() == 255          # white image fully masked
        mask1 = np.asarray(Image.open(ds / "img1-masklabel.png"))
        assert mask1.max() == 0           # dark image unmasked

        # batch caption via a stub model (registry monkeypatched)
        class StubModel:
            def caption_folder(self, sample_dir, initial_caption="",
                               caption_prefix="", caption_postfix="",
                               mode="fill", progress_callback=None,
                               error_callback=None,
                               include_subdirectories=False):
                import os
                names = [f for f in sorted(os.listdir(sample_dir))
                         if f.endswith(".png") and "-masklabel" not in f]
                for i, f in enumerate(names):
                    stem = os.path.splitext(f)[0]
                    p = os.path.join(sample_dir, stem + ".txt")
                    if mode == "fill" and os.path.exists(p) \
                            and open(p).read().strip():
                        continue
                    with open(p, "w") as fh:
                        fh.write(f"stub caption {stem}")
                    if progress_callback:
                        progress_callback(i + 1, len(names))

        monkeypatch.setattr(srv, "_caption_model", lambda name: StubModel())
        r = _req(s.port, "/api/tools/caption",
                 {"dir": str(ds), "model": "blip", "mode": "fill"})
        assert r["ok"]
        deadline = time.time() + 60
        while time.time() < deadline:
            st = _req(s.port, "/api/tools/status")
            if not st["running"]:
                break
            time.sleep(0.2)
        assert st["error"] == "", st
        assert (ds / "img0.txt").read_text().startswith("stub caption")
        # fill mode preserved the existing caption
        assert (ds / "img1.txt").read_text() == "existing caption"
    finally:
        s.shutdown()


def test_ui_timestep_histogram(server):
    """TimestepDistributionWindow equivalent: histogram endpoint reflects
    the configured distribution (reference:
    modules/ui/TimestepDistributionWindow.py)."""
    r = _req(server.port, "/api/config",
             {"timestep_distribution": "LOGIT_NORMAL"})
    assert r["ok"]
    h = _req(server.port, "/api/timesteps")
    assert len(h["counts"]) == 50 and sum(h["counts"]) == 20000
    assert "LOGIT_NORMAL" in h["distribution"]
    # logit-normal mass concentrates mid-range, not at the edges
    assert max(h["counts"][20:30]) > max(h["counts"][0], h["counts"][-1])


def test_ui_rejects_foreign_origin(server):
    """CSRF / DNS-rebinding guard: browser requests from a foreign page
    (Origin header not pointing at this server) are refused for both GET
    and POST; same-origin and non-browser (no Origin) requests pass."""
    import urllib.error

    for method, body in (("GET", None), ("POST", b"{}")):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/api/config", data=body,
            headers={"Origin": "https://evil.example",
                     "Content-Type": "application/json"}, method=method)
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("foreign origin was accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 403
    ok = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/api/config",
        headers={"Origin": f"http://127.0.0.1:{server.port}"})
    with urllib.request.urlopen(ok, timeout=30) as r:
        assert r.status == 200


def test_ui_debug_stack_dump(server):
    """ProfilingWindow's faulthandler stack dump equivalent (reference:
    modules/ui/ProfilingWindow.py:40-43): returns live thread stacks."""
    r = _req(server.port, "/api/debug/stack")
    assert "Thread" in r["stacks"] or "File" in r["stacks"]
    assert "dump_traceback" in r["stacks"] or ".py" in r["stacks"]


def test_ui_custom_sample_endpoint(server):
    """SampleWindow equivalent: POST queues a TrainCommands custom sample
    with the caller's prompt."""
    r = _req(server.port, "/api/train/sample_custom",
             {"prompt": "a red cube", "seed": 9, "width": 64})
    assert r["ok"]
    queued = server.ui.commands.get_and_reset_sample_custom_commands()
    assert len(queued) == 1
    assert queued[0].prompt == "a red cube"
    assert queued[0].seed == 9 and queued[0].width == 64


def test_ui_video_tool_endpoint(tmp_path):
    """VideoToolUI equivalent: clip extraction over HTTP."""
    from tests.test_tooling import _write_two_scene_video

    vid = str(tmp_path / "v.mp4")
    _write_two_scene_video(vid)
    out = str(tmp_path / "clips")

    s = TrainUIServer(port=0)
    s.serve_background()
    try:
        r = _req(s.port, "/api/tools/video",
                 {"mode": "clips", "video": vid, "output_dir": out})
        assert r["ok"]
        deadline = time.time() + 120
        while time.time() < deadline:
            st = _req(s.port, "/api/tools/status")
            if not st["running"]:
                break
            time.sleep(0.5)
        assert st["error"] == "", st
        import os
        assert os.path.isdir(out) and len(os.listdir(out)) >= 2
    finally:
        s.shutdown()


def test_ui_convert_model_endpoint(tmp_path):
    """ConvertModelUI equivalent: diffusers dir -> single-file LDM
    safetensors through the subprocess-driven endpoint."""
    import os

    base = str(tmp_path / "ckpt")
    write_tiny_checkpoint(base, tiny_sd_model())
    out = str(tmp_path / "out.safetensors")

    s = TrainUIServer(port=0)
    s.serve_background()
    try:
        r = _req(s.port, "/api/tools/convert",
                 {"model_type": "STABLE_DIFFUSION_15", "input": base,
                  "output": out, "output_model_format": "SAFETENSORS"})
        assert r["ok"]
        deadline = time.time() + 300
        while time.time() < deadline:
            st = _req(s.port, "/api/tools/status")
            if not st["running"]:
                break
            time.sleep(1)
        assert st["error"] == "", st
        assert os.path.isfile(out)
        from onetrainer_tpu.io.safetensors_io import load_safetensors
        sd = load_safetensors(out)
        assert any(k.startswith("model.diffusion_model.") for k in sd)
    finally:
        s.shutdown()


def test_ui_concept_stats_and_preview(tmp_path):
    """ConceptWindow equivalents: folder stats + live augmentation
    preview over the REAL augmentation pipeline (reference:
    modules/ui/ConceptWindow.py — stats pane + aug preview)."""
    import base64
    import io

    from PIL import Image

    ds = make_dataset(str(tmp_path / "ds"), n=4)
    s = TrainUIServer(port=0)
    s.serve_background()
    try:
        stats = _req(s.port, "/api/concept/stats?path=" +
                     urllib.request.quote(ds))
        assert stats["image_count"] == 4
        assert stats["paired_captions"] == 4
        assert stats["mask_count"] == 1

        concept = {"path": ds,
                   "image": {"enable_random_flip": True,
                             "enable_fixed_flip": True,
                             "enable_random_brightness": True,
                             "random_brightness_max_strength": 0.3},
                   "text": {"enable_tag_shuffling": True,
                            "tag_delimiter": ",", "keep_tags_count": 1}}
        r = _req(s.port, "/api/concept/preview",
                 {"concept": concept, "seed": 3, "index": 0})
        assert r["count"] == 4 and r["name"] == "img0.png"
        img = Image.open(io.BytesIO(base64.b64decode(r["image"])))
        assert img.size[0] > 0
        assert r["mask"]    # img0 has a -masklabel.png
        assert r["caption"]
        # flipped: augmented image != original (fixed flip always fires)
        orig = Image.open(f"{ds}/img0.png").convert("RGB")
        import numpy as np
        assert not np.array_equal(np.asarray(img), np.asarray(orig))

        # bad folder degrades to an error field, not a 500
        r = _req(s.port, "/api/concept/preview",
                 {"concept": {"path": str(tmp_path / "missing")}})
        assert "error" in r
    finally:
        s.shutdown()


def test_ui_optimizer_params_dialog(server):
    """OptimizerParamsWindow equivalent: per-optimizer key list from
    OPTIMIZER_DEFAULT_PARAMETERS, updates persisted per optimizer, and
    change_optimizer semantics on switch (reference:
    modules/ui/OptimizerParamsWindow.py + optimizer_util)."""
    r = _req(server.port, "/api/optimizer/params")
    assert r["optimizer"] == "ADAMW"
    assert "beta1" in r["keys"] and "weight_decay" in r["keys"]
    assert "ADAMW_8BIT" in r["optimizers"]

    # tweak a hyperparameter of the current optimizer
    r = _req(server.port, "/api/optimizer/params", {"weight_decay": 0.05})
    assert r["ok"] and r["params"]["weight_decay"] == 0.05

    # switch: PRODIGY gets its own defaults + key set
    r = _req(server.port, "/api/optimizer/change", {"optimizer": "PRODIGY"})
    assert r["ok"] and "d_coef" in r["keys"]
    assert r["params"]["optimizer"] == "PRODIGY"
    cfg = _req(server.port, "/api/config")
    assert cfg["optimizer"]["optimizer"] == "PRODIGY"

    # switch back: the user's ADAMW weight_decay was remembered
    r = _req(server.port, "/api/optimizer/change", {"optimizer": "ADAMW"})
    assert r["params"]["weight_decay"] == 0.05


def test_ui_mask_paint_endpoint(tmp_path):
    """CaptionUI mask-painting equivalent: the canvas posts a data-URL
    PNG, the server writes the reference's -masklabel.png convention
    (reference: modules/ui/CaptionUI.py:53-60)."""
    import base64
    import io
    import os

    import numpy as np
    from PIL import Image

    ds = make_dataset(str(tmp_path / "ds"), n=2)
    s = TrainUIServer(port=0)
    s.serve_background()
    try:
        # a small white-disk-on-black mask, sent as the canvas would
        arr = np.zeros((64, 64), np.uint8)
        arr[16:48, 16:48] = 255
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        data_url = "data:image/png;base64," + \
            base64.b64encode(buf.getvalue()).decode()
        r = _req(s.port, "/api/dataset/mask",
                 {"dir": ds, "name": "img1.png", "mask": data_url})
        assert r["ok"]
        mp = os.path.join(ds, "img1-masklabel.png")
        assert os.path.isfile(mp)
        saved = np.asarray(Image.open(mp))
        assert saved.shape == (64, 64)
        assert saved[32, 32] == 255 and saved[0, 0] == 0
        # the dataset listing now reports the mask
        rows = _req(s.port, "/api/dataset?dir=" + urllib.request.quote(ds))
        row = next(x for x in rows["images"] if x["name"] == "img1.png")
        assert row["has_mask"]
    finally:
        s.shutdown()


def test_ui_page_references_only_live_routes():
    """Every /api or /dataset or /samples route the page's client JS
    calls must be handled by the server (a malformed-page regression —
    dead endpoint — would otherwise ship silently; VERDICT r3 weak #8)."""
    import re

    import onetrainer_tpu.ui.server as srv
    from onetrainer_tpu.ui.page import PAGE_HTML

    with open(srv.__file__, encoding="utf-8") as f:
        server_src = f.read()
    routes = set(re.findall(r"\"(/(?:api|dataset|samples)[a-z_/]*)", PAGE_HTML))
    assert routes, "no routes found in the page — regex rot?"
    for route in routes:
        base = route.rstrip("/")
        assert f'"{base}"' in server_src or f'"{base}/' in server_src or \
            base.rstrip("/") in server_src, f"page calls unhandled {route}"
    # and the page really wires the new editors
    for needle in ("/api/concept/stats", "/api/concept/preview",
                   "/api/optimizer/params", "/api/optimizer/change",
                   "/api/dataset/mask", "/api/scheduler/params",
                   "renderList(", "edit raw JSON"):
        assert needle in PAGE_HTML, f"page lost its {needle} wiring"


def test_ui_scheduler_params_dialog(server):
    """SchedulerParamsWindow equivalent: LR-scheduler choice, CUSTOM
    class name, and the key/value scheduler_params list with the
    %PLACEHOLDER% vocabulary (reference:
    modules/ui/SchedulerParamsWindow.py:109-116)."""
    r = _req(server.port, "/api/scheduler/params")
    assert r["scheduler"] == "CONSTANT"
    assert "CUSTOM" in r["schedulers"] and "COSINE" in r["schedulers"]
    assert "TOTAL_STEPS" in r["placeholders"]

    # switch to CUSTOM with a class + params, as the dialog would
    r = _req(server.port, "/api/scheduler/params", {
        "scheduler": "CUSTOM",
        "custom_class": "torch.optim.lr_scheduler.StepLR",
        "params": [{"key": "step_size", "value": "%STEPS_PER_EPOCH%"},
                   {"key": "gamma", "value": "0.5"}],
    })
    assert r["ok"] and r["scheduler"] == "CUSTOM"
    assert r["custom_class"] == "torch.optim.lr_scheduler.StepLR"
    assert r["params"][0]["value"] == "%STEPS_PER_EPOCH%"
    cfg = _req(server.port, "/api/config")
    assert cfg["learning_rate_scheduler"] == "CUSTOM"
    assert cfg["scheduler_params"][1] == {"key": "gamma", "value": "0.5"}

    # malformed params are rejected with 400, config untouched
    import urllib.error
    try:
        _req(server.port, "/api/scheduler/params",
             {"params": [{"key": "a", "value": 3}]})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    cfg = _req(server.port, "/api/config")
    assert cfg["scheduler_params"][1] == {"key": "gamma", "value": "0.5"}

    # back to a stock scheduler
    r = _req(server.port, "/api/scheduler/params", {"scheduler": "COSINE"})
    assert r["ok"] and r["scheduler"] == "COSINE"
