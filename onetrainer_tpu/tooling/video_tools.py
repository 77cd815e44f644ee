"""Dataset video tooling: clip extraction (with scene-cut splitting) and
frame extraction (with blur filtering).

Behavioral equivalents of the reference's video tool (reference:
modules/ui/VideoToolUI.py:284-437 — extract_clips splits at scenedetect
AdaptiveDetector cuts and a max length; save_frames samples frames at a
capture rate with triangular jitter, ranks them by Laplacian-variance
sharpness and drops the blurriest fraction). scenedetect is not in this
image, so cut detection is a self-contained adaptive content detector:
per-frame HSV mean-absolute-difference scored against a rolling-window
average, the same signal scenedetect's AdaptiveDetector thresholds.
yt-dlp download is N/A in a zero-egress environment.
"""

from __future__ import annotations

import os

import numpy as np


def _content_scores(video_path: str, downscale: int = 4):
    """Per-frame HSV content change vs the previous frame."""
    import cv2
    cap = cv2.VideoCapture(video_path)
    scores = [0.0]
    prev = None
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        small = frame[::downscale, ::downscale]
        hsv = cv2.cvtColor(small, cv2.COLOR_BGR2HSV).astype(np.float32)
        if prev is not None:
            scores.append(float(np.abs(hsv - prev).mean()))
        prev = hsv
    cap.release()
    return np.asarray(scores[1:], np.float32)   # score[i] = change i -> i+1


def detect_scene_cuts(video_path: str, adaptive_ratio: float = 3.0,
                      min_content_value: float = 5.0,
                      window: int = 2) -> list[int]:
    """Frame indices where a new scene starts (adaptive threshold: change
    must exceed `adaptive_ratio`× the neighboring frames' average change
    and an absolute floor — the scenedetect AdaptiveDetector recipe)."""
    scores = _content_scores(video_path)
    cuts = []
    for i, s in enumerate(scores):
        lo, hi = max(0, i - window), min(len(scores), i + window + 1)
        neighbors = np.concatenate([scores[lo:i], scores[i + 1:hi]])
        baseline = float(neighbors.mean()) if neighbors.size else 0.0
        if s >= min_content_value and s >= adaptive_ratio * max(baseline, 1e-6):
            cuts.append(i + 1)
    return cuts


def extract_clips(video_path: str, output_dir: str,
                  max_length_sec: float = 2.0,
                  split_at_cuts: bool = True) -> list[str]:
    """Split a video into clips at scene cuts, then at max_length
    (reference: VideoToolUI.__extract_clips:314-348). Returns the written
    clip paths, named `{basename}_{start}-{end}.avi` like the reference."""
    import cv2
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()

    if split_at_cuts:
        cuts = detect_scene_cuts(video_path)
        bounds = [0] + cuts + [n_frames]
        scenes = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
                  if bounds[i + 1] > bounds[i]]
    else:
        scenes = [(0, n_frames)]

    # split long scenes at max_length
    max_frames = max(int(max_length_sec * fps), 1)
    pieces = []
    for start, end in scenes:
        s = start
        while s < end:
            pieces.append((s, min(s + max_frames, end)))
            s += max_frames

    os.makedirs(output_dir, exist_ok=True)
    basename = os.path.splitext(os.path.basename(video_path))[0]
    written = []
    for start, end in pieces:
        out_path = os.path.join(output_dir, f"{basename}_{start}-{end}.avi")
        _save_clip(video_path, start, end, out_path, fps)
        written.append(out_path)
    return written


def _save_clip(video_path: str, start: int, end: int, out_path: str,
               fps: float):
    import cv2
    cap = cv2.VideoCapture(video_path)
    size = (int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"XVID"),
                             fps, size)
    cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    for _ in range(end - start):
        ok, frame = cap.read()
        if not ok:
            break
        writer.write(frame)
    writer.release()
    cap.release()


def extract_frames(video_path: str, output_dir: str,
                   capture_rate: float = 0.5,
                   blur_threshold: float = 0.2,
                   seed: int = 0) -> list[str]:
    """Sample frames every 1/capture_rate seconds with triangular jitter,
    rank by Laplacian-variance sharpness, drop the blurriest
    `blur_threshold` fraction (reference: VideoToolUI.__save_frames:
    399-437; deterministic via an explicit seed instead of global
    random)."""
    import cv2
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    image_rate = max(int(fps / capture_rate), 1)

    rng = np.random.default_rng(seed)
    frame_list = []
    for n in range(0, n_frames, image_rate):
        jitter = rng.triangular(n - image_rate / 2, n, n + image_rate / 2)
        frame_list.append(min(abs(int(jitter)), n_frames - 1))

    scored = []
    for f in frame_list:
        cap.set(cv2.CAP_PROP_POS_FRAMES, f)
        ok, frame = cap.read()
        if ok:
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            scored.append((f, float(cv2.Laplacian(gray, cv2.CV_64F).var())))

    scored.sort(key=lambda x: x[1])
    cutoff = int(blur_threshold * len(scored))
    kept = scored[cutoff:]

    os.makedirs(output_dir, exist_ok=True)
    basename = os.path.splitext(os.path.basename(video_path))[0]
    written = []
    for f, _ in sorted(kept):
        cap.set(cv2.CAP_PROP_POS_FRAMES, f)
        ok, frame = cap.read()
        if ok:
            path = os.path.join(output_dir, f"{basename}_{f}.jpg")
            cv2.imwrite(path, frame)
            written.append(path)
    cap.release()
    return written
