"""Web training UI — the TPU-native re-design of the reference's
customtkinter desktop app (reference: modules/ui/TrainUI.py:44-666 —
tabbed config editor, training thread with callbacks re-entering the UI
:586-628, UIState data binding onto config objects).

Re-design, not a port: TPU training runs on headless cloud VMs where a
Tk desktop is useless, so the UI is a single-page web app served by a
stdlib ThreadingHTTPServer — zero extra dependencies, reachable over an
SSH port-forward, and fully testable without a display (tests/test_ui.py
drives every endpoint over HTTP). The same TrainCallbacks/TrainCommands
objects the reference's UI uses wire the training thread to the page:
status line, progress, smoothed loss, sample previews, and the
stop/backup/save/sample buttons map 1:1 to the reference's toolbar.

Endpoints (JSON unless noted):
  GET  /                      single-page app (HTML)
  GET  /api/config            current TrainConfig as a dict
  POST /api/config            merge a partial dict into the config
  GET  /api/presets           preset *.json files in presets_dir
  POST /api/preset/load       {"name": ...} -> replace config from preset
  POST /api/train/start       launch the training thread
  POST /api/train/stop        TrainCommands.stop()
  POST /api/train/backup      TrainCommands.backup()
  POST /api/train/save        TrainCommands.save()
  POST /api/train/sample      TrainCommands.sample_default()
  POST /api/train/sample_custom  {prompt, ...SampleConfig fields} ->
                              TrainCommands.sample_custom (the reference's
                              SampleWindow: one-off prompt while training)
  GET  /api/timesteps         histogram of the configured timestep
                              distribution (TimestepDistributionWindow)
  GET  /api/status            {state, status, progress, loss, error,
                              samples, custom_samples}
  GET  /samples/<name>        sample image from <workspace>/samples (binary;
                              also /samples/custom/<name>)
  GET  /api/concept/stats     ?path= -> folder stats (ConceptWindow)
  POST /api/concept/preview   {concept, seed, index} -> augmented
                              image/mask/caption preview (ConceptWindow)
  GET  /api/optimizer/params  current optimizer + applicable hyperparam keys
  POST /api/optimizer/params  update current optimizer settings (persisted
                              per-optimizer like the reference)
  POST /api/optimizer/change  {"optimizer": name} -> switch with
                              change_optimizer semantics
  GET  /api/scheduler/params  LR scheduler choice + CUSTOM class +
                              key/value params (SchedulerParamsWindow)
  POST /api/scheduler/params  update scheduler/custom_class/params
  POST /api/dataset/mask      {dir, name, mask: dataURL-png} -> write
                              <stem>-masklabel.png (CaptionUI mask paint)
"""

from __future__ import annotations

import json
import os
import threading
import urllib.parse
import traceback
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.ui.page import PAGE_HTML
from onetrainer_tpu.util.callbacks import TrainCallbacks
from onetrainer_tpu.util.commands import TrainCommands

_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def _caption_model(name: str):
    """Batch captioning model factory (reference: GenerateCaptionsWindow
    model choices). Kept in a function so tests can monkeypatch."""
    from onetrainer_tpu.tooling.caption_models import Blip2Model, BlipModel
    return {"blip": BlipModel, "blip2": Blip2Model}[name]()


def _mask_model(name: str, body: dict):
    from onetrainer_tpu.tooling.mask_models import ClipSegModel, MaskByColor
    if name == "color":
        return MaskByColor(tuple(body.get("color", (255, 255, 255))),
                           float(body.get("distance", 30.0)))
    return ClipSegModel()


def _concept_preview(body: dict) -> dict:
    """One-image augmentation preview for the concept editor: loads the
    index-th image (+ mask + caption) of the concept folder, applies the
    concept's image/text augmentations with a caller-chosen seed, and
    returns the result as inline base64 PNGs (reference:
    modules/ui/ConceptWindow.py augmentation preview over the same
    pipeline the data loader uses — here data/augments.py, which IS the
    loader's pipeline, so the preview cannot drift from training)."""
    import base64
    import io

    import numpy as np
    from PIL import Image

    from onetrainer_tpu.config.concept_config import ConceptConfig
    from onetrainer_tpu.data.augments import augment_image, augment_text

    concept = ConceptConfig.default_values().from_dict(body.get("concept", {}))
    d = concept.path
    if not d or not os.path.isdir(d):
        return {"error": f"not a directory: {d}"}
    files = sorted(
        f for f in os.listdir(d)
        if os.path.splitext(f)[1].lower() in _IMAGE_EXTS
        and not os.path.splitext(f)[0].endswith(("-masklabel", "-condlabel")))
    if not files:
        return {"error": "no images in concept folder"}
    idx = int(body.get("index", 0)) % len(files)
    name = files[idx]
    stem = os.path.splitext(name)[0]
    image = np.asarray(
        Image.open(os.path.join(d, name)).convert("RGB"), np.float32) / 255.0
    mask = None
    mask_path = os.path.join(d, stem + "-masklabel.png")
    if os.path.isfile(mask_path):
        mask = (np.asarray(Image.open(mask_path).convert("L"),
                           np.float32) / 255.0)[..., None]
    caption = ""
    cap_path = os.path.join(d, stem + ".txt")
    if os.path.isfile(cap_path):
        with open(cap_path, encoding="utf-8") as f:
            caption = f.read().strip()

    rng = np.random.default_rng(int(body.get("seed", 0)))
    image, mask = augment_image(image, concept, rng, mask)
    caption = augment_text(caption, concept, rng)

    def b64(arr):
        buf = io.BytesIO()
        Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(
            buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    return {
        "name": name, "index": idx, "count": len(files),
        "caption": caption,
        "image": b64(image),
        "mask": b64(np.repeat(mask, 3, axis=-1)) if mask is not None else None,
    }


class TrainUIState:
    """Shared state between the HTTP handlers and the training thread
    (the reference holds the same things on the TrainUI object)."""

    def __init__(self, config: TrainConfig | None = None,
                 presets_dir: str | None = None):
        self.lock = threading.Lock()
        self.config = config or TrainConfig.default_values()
        self.presets_dir = presets_dir
        self.state = "idle"          # idle | running | done | error
        self.status_text = ""
        self.error = ""
        self.progress = {"epoch": 0, "epoch_step": 0, "global_step": 0,
                         "max_sample": 0, "max_epoch": 0}
        self.loss = deque(maxlen=500)
        self.thread: threading.Thread | None = None
        self.trainer = None
        self.commands = TrainCommands()
        # dataset tools (reference: GenerateCaptionsWindow /
        # GenerateMasksWindow run on a worker thread with a progress bar)
        self.tools = {"running": False, "kind": "", "done": 0, "total": 0,
                      "error": ""}
        self.callbacks = TrainCallbacks(
            on_update_status=self._on_status,
            on_update_train_progress=self._on_progress,
        )

    # -- callbacks from the training thread ---------------------------------------

    def _on_status(self, text: str):
        with self.lock:
            self.status_text = str(text)

    def _on_progress(self, train_progress, max_sample: int, max_epoch: int):
        with self.lock:
            self.progress = {
                "epoch": train_progress.epoch,
                "epoch_step": train_progress.epoch_step,
                "global_step": train_progress.global_step,
                "max_sample": max_sample,
                "max_epoch": max_epoch,
            }
            trainer = self.trainer
        if trainer is not None and getattr(trainer, "_loss_ema", None) is not None:
            with self.lock:
                self.loss.append(
                    [train_progress.global_step, float(trainer._loss_ema)])

    # -- training thread (reference: TrainUI.__training_thread_function) ----------

    def start_training(self) -> bool:
        with self.lock:
            if self.state == "running":
                return False
            self.state = "running"
            self.error = ""
            self.loss.clear()
            self.commands = TrainCommands()

        def run():
            from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
            try:
                trainer = GenericTrainer(self.config, self.callbacks,
                                         self.commands)
                with self.lock:
                    self.trainer = trainer
                trainer.start()
                trainer.train()
                trainer.end()
                with self.lock:
                    self.state = "done"
                    self.status_text = "finished"
            except Exception as e:
                traceback.print_exc()
                with self.lock:
                    self.state = "error"
                    self.error = f"{type(e).__name__}: {e}"
            finally:
                with self.lock:
                    self.trainer = None

        self.thread = threading.Thread(target=run, daemon=True)
        self.thread.start()
        return True

    def sample_dir(self) -> str:
        return os.path.join(self.config.workspace_dir or ".", "samples")

    def run_tool(self, kind: str, fn) -> bool:
        """Run a captioning/masking job on a worker thread with progress."""
        with self.lock:
            if self.tools["running"]:
                return False
            self.tools = {"running": True, "kind": kind, "done": 0,
                          "total": 0, "error": ""}

        def progress(done, total):
            with self.lock:
                self.tools["done"] = done
                self.tools["total"] = total

        def run():
            try:
                fn(progress)
                with self.lock:
                    self.tools["running"] = False
            except Exception as e:
                traceback.print_exc()
                with self.lock:
                    self.tools.update(running=False,
                                      error=f"{type(e).__name__}: {e}")

        threading.Thread(target=run, daemon=True).start()
        return True

    def snapshot(self) -> dict:
        with self.lock:
            samples, custom = [], []
            sdir = self.sample_dir()
            if os.path.isdir(sdir):
                # samples live in per-prompt subfolders
                # ("{i} - {safe_prompt}", reference GenericTrainer layout);
                # list workspace-relative paths, newest last
                found = []
                for d in os.listdir(sdir):
                    if d == "custom":
                        continue
                    pdir = os.path.join(sdir, d)
                    if not os.path.isdir(pdir):
                        continue
                    # only the files directly inside each per-prompt
                    # folder: video image-sequence FRAMES live one level
                    # deeper ({stem}/00000.png) and would flood the
                    # newest-8 gallery
                    for f in os.listdir(pdir):
                        fp = os.path.join(pdir, f)
                        if os.path.isfile(fp):
                            found.append((os.path.getmtime(fp),
                                          f"{d}/{f}"))
                samples = [p for _, p in sorted(found)][-8:]
            cdir = os.path.join(sdir, "custom")
            if os.path.isdir(cdir):
                custom = sorted(os.listdir(cdir))[-8:]
            return {
                "state": self.state,
                "status": self.status_text,
                "progress": dict(self.progress),
                "loss": list(self.loss)[-200:],
                "error": self.error,
                "samples": samples,
                "custom_samples": custom,
            }


def _make_handler(ui: TrainUIState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):   # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, code: int = 200):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            if not n:
                return {}
            return json.loads(self.rfile.read(n).decode() or "{}")

        def _origin_ok(self) -> bool:
            """Cross-origin / DNS-rebinding guard: the API can read and
            write files and launch tool subprocesses, so a foreign web
            page must not be able to drive it. Browser requests carry an
            Origin (POST/fetch) and always a Host; both must point back
            at this server (local names, or the explicitly configured
            bind host). Non-browser clients (curl, the tests) send no
            Origin and pass. Binding to 0.0.0.0/:: skips the Host check
            — the operator exposed the server on purpose — but the
            Origin check still blocks foreign pages."""
            from urllib.parse import urlparse
            allowed = {"localhost", "127.0.0.1", "::1", "[::1]"}
            bind = getattr(ui, "bind_host", "127.0.0.1")
            wildcard = bind in ("0.0.0.0", "::", "")
            if not wildcard:
                allowed.add(bind)
            host = (self.headers.get("Host") or "").split(":")[0]
            if host and not wildcard and host not in allowed:
                return False
            origin = self.headers.get("Origin")
            if origin and origin != "null":
                ohost = urlparse(origin).hostname or ""
                if ohost not in allowed and not (wildcard and ohost == host):
                    return False
            return True

        def do_GET(self):
            if not self._origin_ok():
                self._json({"error": "forbidden origin"}, 403)
                return
            path = self.path.split("?")[0]
            if path in ("/", "/index.html"):
                self._send(200, PAGE_HTML.encode(), "text/html; charset=utf-8")
            elif path == "/api/config":
                self._json(ui.config.to_dict())
            elif path == "/api/status":
                self._json(ui.snapshot())
            elif path == "/api/presets":
                names = []
                if ui.presets_dir and os.path.isdir(ui.presets_dir):
                    names = sorted(f for f in os.listdir(ui.presets_dir)
                                   if f.endswith(".json"))
                self._json({"presets": names})
            elif path.startswith("/samples/"):
                rel = urllib.parse.unquote(path[len("/samples/"):])
                sdir = os.path.realpath(ui.sample_dir())
                fp = os.path.realpath(os.path.join(sdir, rel))
                name = os.path.basename(rel)
                # nested per-prompt folders are fine; escaping sample_dir
                # is not
                if not fp.startswith(sdir + os.sep):
                    self._json({"error": "not found"}, 404)
                elif os.path.isfile(fp):
                    with open(fp, "rb") as f:
                        data = f.read()
                    ext = os.path.splitext(name)[1].lstrip(".") or "png"
                    self._send(200, data, f"image/{ext}")
                else:
                    self._json({"error": "not found"}, 404)
            elif path == "/api/dataset":
                # caption/mask editor backing store (reference: CaptionUI)
                d = self._query().get("dir", "")
                if not os.path.isdir(d):
                    self._json({"error": f"not a directory: {d}"}, 400)
                    return
                rows = []
                for f in sorted(os.listdir(d)):
                    stem, ext = os.path.splitext(f)
                    if ext.lower() not in _IMAGE_EXTS or \
                            stem.endswith(("-masklabel", "-condlabel")):
                        continue
                    cap_path = os.path.join(d, stem + ".txt")
                    caption = ""
                    if os.path.isfile(cap_path):
                        with open(cap_path, encoding="utf-8") as fh:
                            caption = fh.read()
                    rows.append({
                        "name": f, "caption": caption,
                        "has_mask": os.path.isfile(
                            os.path.join(d, stem + "-masklabel.png")),
                    })
                self._json({"images": rows})
            elif path == "/dataset/image":
                q = self._query()
                fp = os.path.join(q.get("dir", ""),
                                  os.path.basename(q.get("name", "")))
                if os.path.isfile(fp):
                    with open(fp, "rb") as f:
                        data = f.read()
                    ext = os.path.splitext(fp)[1].lstrip(".") or "png"
                    self._send(200, data, f"image/{ext}")
                else:
                    self._json({"error": "not found"}, 404)
            elif path == "/api/concept/stats":
                # the reference ConceptWindow's folder-stats pane
                # (modules/ui/ConceptWindow.py concept_stats usage;
                # modules/util/concept_stats.py:13-85)
                from onetrainer_tpu.util.concept_stats import folder_scan
                q = self._query()
                p = q.get("path", "")
                if not os.path.isdir(p):
                    self._json({"error": f"not a directory: {p}"}, 400)
                    return
                try:
                    res = int(str(q.get("resolution", "512")).split(",")[0])
                except ValueError:
                    res = 512
                self._json(folder_scan(
                    p,
                    include_subdirectories=q.get(
                        "include_subdirectories") in ("1", "true"),
                    target_resolution=res))
            elif path == "/api/optimizer/params":
                # the reference OptimizerParamsWindow's form model: which
                # hyperparameters apply to the current optimizer
                # (modules/ui/OptimizerParamsWindow.py over
                # OPTIMIZER_DEFAULT_PARAMETERS)
                from onetrainer_tpu.util.enums import Optimizer
                from onetrainer_tpu.util.optimizer_util import (
                    OPTIMIZER_DEFAULT_PARAMETERS,
                )
                opt = ui.config.optimizer.optimizer
                self._json({
                    "optimizer": str(opt),
                    "keys": sorted(OPTIMIZER_DEFAULT_PARAMETERS.get(opt, {})),
                    "params": ui.config.optimizer.to_dict(),
                    "optimizers": [str(o) for o in Optimizer],
                })
            elif path == "/api/scheduler/params":
                # the reference SchedulerParamsWindow's form model: the LR
                # scheduler choice, the CUSTOM class name, and the
                # key/value scheduler_params list with its %PLACEHOLDER%
                # vocabulary (modules/ui/SchedulerParamsWindow.py:109-116;
                # placeholders per train/lr_schedules.py:178-190)
                from onetrainer_tpu.util.enums import LearningRateScheduler
                self._json({
                    "scheduler": str(ui.config.learning_rate_scheduler),
                    "schedulers": [str(s) for s in LearningRateScheduler],
                    "custom_class":
                        ui.config.custom_learning_rate_scheduler,
                    "params": list(ui.config.scheduler_params or []),
                    "placeholders": ["LR", "EPOCHS", "STEPS_PER_EPOCH",
                                     "TOTAL_STEPS", "SCHEDULER_STEPS"],
                })
            elif path == "/api/tools/status":
                with ui.lock:
                    self._json(dict(ui.tools))
            elif path == "/api/debug/stack":
                # the reference ProfilingWindow's faulthandler stack dump
                # (modules/ui/ProfilingWindow.py:40-43) — all live thread
                # stacks, for diagnosing a stuck training loop remotely
                import sys
                import threading
                import traceback
                names = {t.ident: t.name for t in threading.enumerate()}
                lines = []
                for ident, frame in sys._current_frames().items():
                    lines.append(f"Thread {names.get(ident, ident)}:")
                    lines.extend(traceback.format_stack(frame))
                self._json({"stacks": "".join(
                    ln if ln.endswith("\n") else ln + "\n" for ln in lines)})
            elif path == "/api/timesteps":
                # the reference's TimestepDistributionWindow: plot the
                # sampled-timestep density for the current train config
                # (modules/ui/TimestepDistributionWindow.py). Rendered
                # client-side as an SVG bar chart.
                import jax
                import numpy as np
                from onetrainer_tpu.math.timesteps import (
                    TimestepConfig, sample_timesteps_discrete,
                )
                tcfg = TimestepConfig.from_train_config(ui.config)
                if tcfg.dynamic_timestep_shifting:
                    tcfg = __import__("dataclasses").replace(
                        tcfg, dynamic_timestep_shifting=False)
                ts = np.asarray(sample_timesteps_discrete(
                    jax.random.PRNGKey(0), 20000, tcfg))
                counts, edges = np.histogram(ts, bins=50, range=(0, 1000))
                self._json({
                    "distribution": str(ui.config.timestep_distribution),
                    "edges": [float(e) for e in edges],
                    "counts": [int(c) for c in counts],
                })
            else:
                self._json({"error": "not found"}, 404)

        def _query(self) -> dict:
            from urllib.parse import parse_qs, urlparse
            q = parse_qs(urlparse(self.path).query)
            return {k: v[0] for k, v in q.items()}

        def do_POST(self):
            if not self._origin_ok():
                self._json({"error": "forbidden origin"}, 403)
                return
            path = self.path.split("?")[0]
            try:
                if path == "/api/config":
                    patch = self._body()
                    merged = ui.config.to_dict()
                    merged.update(patch)
                    ui.config = TrainConfig.default_values().from_dict(merged)
                    self._json({"ok": True})
                elif path == "/api/preset/load":
                    name = os.path.basename(self._body().get("name", ""))
                    fp = os.path.join(ui.presets_dir or "", name)
                    with open(fp) as f:
                        ui.config = TrainConfig.default_values().from_dict(
                            json.load(f))
                    self._json({"ok": True})
                elif path == "/api/train/start":
                    started = ui.start_training()
                    self._json({"ok": started,
                                "error": "" if started else "already running"})
                elif path == "/api/train/stop":
                    ui.commands.stop()
                    self._json({"ok": True})
                elif path == "/api/train/backup":
                    ui.commands.backup()
                    self._json({"ok": True})
                elif path == "/api/train/save":
                    ui.commands.save()
                    self._json({"ok": True})
                elif path == "/api/train/sample":
                    ui.commands.sample_default()
                    self._json({"ok": True})
                elif path == "/api/train/sample_custom":
                    # SampleWindow equivalent: queue a one-off sample with
                    # a caller-supplied prompt; the training loop polls the
                    # queue and writes to samples/custom
                    from onetrainer_tpu.config.sample_config import (
                        SampleConfig,
                    )
                    cfg = SampleConfig.default_values().from_dict(
                        self._body())
                    ui.commands.sample_custom(cfg)
                    self._json({"ok": True})
                elif path == "/api/dataset/caption":
                    b = self._body()
                    d = b["dir"]
                    stem = os.path.splitext(os.path.basename(b["name"]))[0]
                    if not os.path.isdir(d):
                        self._json({"error": "not a directory"}, 400)
                        return
                    with open(os.path.join(d, stem + ".txt"), "w",
                              encoding="utf-8") as f:
                        f.write(b.get("caption", ""))
                    self._json({"ok": True})
                elif path == "/api/dataset/mask":
                    # canvas mask painting: the page POSTs the painted
                    # mask as a data-URL PNG; stored as the reference's
                    # `-masklabel.png` convention (reference:
                    # modules/ui/CaptionUI.py:53-60 mask paint/fill)
                    import base64
                    import io

                    from PIL import Image
                    b = self._body()
                    d = b["dir"]
                    stem = os.path.splitext(os.path.basename(b["name"]))[0]
                    if not os.path.isdir(d):
                        self._json({"error": "not a directory"}, 400)
                        return
                    data = b.get("mask", "")
                    if "," in data[:64]:   # strip data:image/png;base64,
                        data = data.split(",", 1)[1]
                    img = Image.open(io.BytesIO(base64.b64decode(data)))
                    # binary-ish grayscale, like the reference's editor
                    img.convert("L").save(
                        os.path.join(d, stem + "-masklabel.png"))
                    self._json({"ok": True})
                elif path == "/api/concept/preview":
                    # ConceptWindow's live augmentation preview: run the
                    # real augmentation pipeline (data/augments.py) on one
                    # image of the concept and return it inline
                    # (reference: modules/ui/ConceptWindow.py preview)
                    self._json(_concept_preview(self._body()))
                elif path == "/api/optimizer/params":
                    # update hyperparameters of the CURRENT optimizer and
                    # remember them per-optimizer (reference:
                    # optimizer_util.change_optimizer persistence)
                    from onetrainer_tpu.util.optimizer_util import (
                        save_optimizer_defaults,
                    )
                    patch = self._body()
                    merged = ui.config.optimizer.to_dict()
                    merged.update(patch)
                    from onetrainer_tpu.config.train_config import (
                        TrainOptimizerConfig,
                    )
                    ui.config.optimizer = (TrainOptimizerConfig
                                           .default_values()
                                           .from_dict(merged))
                    save_optimizer_defaults(ui.config)
                    self._json({"ok": True,
                                "params": ui.config.optimizer.to_dict()})
                elif path == "/api/optimizer/change":
                    # switch optimizer: persist the old one's user values,
                    # load the new one's saved-or-default values
                    # (reference: OptimizerParamsWindow +
                    # optimizer_util.change_optimizer)
                    from onetrainer_tpu.util.enums import Optimizer
                    from onetrainer_tpu.util.optimizer_util import (
                        OPTIMIZER_DEFAULT_PARAMETERS, change_optimizer,
                        save_optimizer_defaults,
                    )
                    new = Optimizer(self._body()["optimizer"])
                    save_optimizer_defaults(ui.config)
                    ui.config.optimizer.optimizer = new
                    ui.config.optimizer = change_optimizer(ui.config)
                    self._json({
                        "ok": True, "optimizer": str(new),
                        "keys": sorted(
                            OPTIMIZER_DEFAULT_PARAMETERS.get(new, {})),
                        "params": ui.config.optimizer.to_dict(),
                    })
                elif path == "/api/scheduler/params":
                    # update LR-scheduler settings (reference:
                    # SchedulerParamsWindow ok-button semantics — scheduler
                    # choice, CUSTOM class name, key/value params)
                    from onetrainer_tpu.util.enums import (
                        LearningRateScheduler,
                    )
                    body = self._body()
                    if "scheduler" in body:
                        ui.config.learning_rate_scheduler = (
                            LearningRateScheduler(body["scheduler"]))
                    if "custom_class" in body:
                        ui.config.custom_learning_rate_scheduler = (
                            body["custom_class"] or None)
                    if "params" in body:
                        params = body["params"]
                        if (not isinstance(params, list) or any(
                                not isinstance(p, dict)
                                or set(p) - {"key", "value"}
                                or not all(isinstance(v, str)
                                           for v in p.values())
                                for p in params)):
                            self._json({"error": "params must be a list "
                                        "of {key, value} string pairs"},
                                       code=400)
                            return
                        ui.config.scheduler_params = params
                    self._json({
                        "ok": True,
                        "scheduler":
                            str(ui.config.learning_rate_scheduler),
                        "custom_class":
                            ui.config.custom_learning_rate_scheduler,
                        "params": list(ui.config.scheduler_params or []),
                    })
                elif path == "/api/tools/caption":
                    b = self._body()
                    model = _caption_model(b.get("model", "blip"))
                    started = ui.run_tool(
                        "caption",
                        lambda progress: model.caption_folder(
                            b["dir"],
                            initial_caption=b.get("initial_caption", ""),
                            caption_prefix=b.get("prefix", ""),
                            caption_postfix=b.get("postfix", ""),
                            mode=b.get("mode", "fill"),
                            progress_callback=progress,
                            include_subdirectories=bool(
                                b.get("include_subdirectories"))))
                    self._json({"ok": started})
                elif path == "/api/tools/video":
                    # VideoToolUI equivalent: clip extraction at scene
                    # cuts / sharp-frame extraction (reference:
                    # modules/ui/VideoToolUI.py:314-437)
                    b = self._body()
                    from onetrainer_tpu.tooling import video_tools as vt
                    mode = b.get("mode", "clips")

                    def job(progress, b=b, mode=mode):
                        progress(0, 1)
                        if mode == "frames":
                            vt.extract_frames(
                                b["video"], b["output_dir"],
                                capture_rate=float(b.get("capture_rate", 0.5)),
                                blur_threshold=float(
                                    b.get("blur_threshold", 0.2)))
                        else:
                            vt.extract_clips(
                                b["video"], b["output_dir"],
                                max_length_sec=float(
                                    b.get("max_length_sec", 2.0)),
                                split_at_cuts=bool(
                                    b.get("split_at_cuts", True)))
                        progress(1, 1)

                    self._json({"ok": ui.run_tool(f"video/{mode}", job)})
                elif path == "/api/tools/convert":
                    # ConvertModelUI equivalent: drives the tested CLI in
                    # a subprocess so a bad checkpoint can't take down the
                    # UI (reference: modules/ui/ConvertModelUI.py)
                    b = self._body()

                    def job(progress, b=b):
                        import subprocess
                        import sys
                        progress(0, 1)
                        cmd = [sys.executable, os.path.join(
                            os.path.dirname(__file__), "..", "..",
                            "scripts", "convert_model.py"),
                            "--model-type", b.get("model_type",
                                                  "STABLE_DIFFUSION_15"),
                            "--input", b["input"],
                            "--output", b["output"],
                            "--output-model-format",
                            b.get("output_model_format", "SAFETENSORS"),
                            "--output-dtype", b.get("output_dtype",
                                                    "FLOAT_16")]
                        r = subprocess.run(cmd, capture_output=True,
                                           text=True)
                        if r.returncode != 0:
                            raise RuntimeError(
                                (r.stderr or r.stdout).strip()[-400:])
                        progress(1, 1)

                    self._json({"ok": ui.run_tool("convert", job)})
                elif path == "/api/tools/mask":
                    b = self._body()
                    model = _mask_model(b.get("model", "clipseg"), b)
                    started = ui.run_tool(
                        "mask",
                        lambda progress: model.mask_folder(
                            b["dir"],
                            prompts=[p for p in
                                     str(b.get("prompt", "")).split(",") if p],
                            mode=b.get("mode", "fill"),
                            threshold=float(b.get("threshold", 0.3)),
                            smooth_pixels=int(b.get("smooth_pixels", 5)),
                            expand_pixels=int(b.get("expand_pixels", 10)),
                            alpha=float(b.get("alpha", 1.0)),
                            progress_callback=progress,
                            include_subdirectories=bool(
                                b.get("include_subdirectories"))))
                    self._json({"ok": started})
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:
                traceback.print_exc()
                self._json({"error": f"{type(e).__name__}: {e}"}, 400)

    return Handler


class TrainUIServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 8008,
                 config: TrainConfig | None = None,
                 presets_dir: str | None = None):
        self.ui = TrainUIState(config, presets_dir)
        self.ui.bind_host = host   # consumed by the handler's origin guard
        self.httpd = ThreadingHTTPServer((host, port), _make_handler(self.ui))
        self.port = self.httpd.server_address[1]

    def serve_forever(self):
        self.httpd.serve_forever()

    def serve_background(self):
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
