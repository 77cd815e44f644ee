"""Video dataset tooling CLI: clip extraction and frame extraction
(reference: modules/ui/VideoToolUI.py — the download tab is N/A in a
zero-egress environment)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Video dataset tools")
    sub = p.add_subparsers(dest="command", required=True)

    clips = sub.add_parser("extract-clips",
                           help="split videos into clips at scene cuts")
    clips.add_argument("--input", required=True,
                       help="video file or directory of videos")
    clips.add_argument("--output-dir", required=True)
    clips.add_argument("--max-length", type=float, default=2.0,
                       help="maximum clip length in seconds")
    clips.add_argument("--no-split-at-cuts", action="store_true")

    frames = sub.add_parser("extract-frames",
                            help="sample sharp frames from videos")
    frames.add_argument("--input", required=True)
    frames.add_argument("--output-dir", required=True)
    frames.add_argument("--capture-rate", type=float, default=0.5,
                        help="frames per second to sample")
    frames.add_argument("--blur-threshold", type=float, default=0.2,
                        help="fraction of blurriest frames to drop")
    frames.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _video_paths(input_path: str) -> list[str]:
    exts = (".mp4", ".avi", ".mov", ".mkv", ".webm")
    if os.path.isfile(input_path):
        return [input_path]
    if not os.path.isdir(input_path):
        return []
    return sorted(
        os.path.join(input_path, n) for n in os.listdir(input_path)
        if n.lower().endswith(exts))


def main():
    args = parse_args()
    from onetrainer_tpu.tooling.video_tools import (
        extract_clips, extract_frames,
    )

    paths = _video_paths(args.input)
    if not paths:
        print(f"no videos found at {args.input}")
        sys.exit(1)
    total = 0
    for path in paths:
        if args.command == "extract-clips":
            written = extract_clips(path, args.output_dir,
                                    max_length_sec=args.max_length,
                                    split_at_cuts=not args.no_split_at_cuts)
        else:
            written = extract_frames(path, args.output_dir,
                                     capture_rate=args.capture_rate,
                                     blur_threshold=args.blur_threshold,
                                     seed=args.seed)
        print(f"{os.path.basename(path)}: wrote {len(written)} files")
        total += len(written)
    print(f"done: {total} files in {args.output_dir}")


if __name__ == "__main__":
    main()
