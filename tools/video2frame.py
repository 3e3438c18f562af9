#!/usr/bin/env python
"""Extract video files into 1-indexed JPEG frame directories.

Parity: tools/video2frame.py in the reference — frames named ``<n>.jpg``
starting at 1, JPEG quality 80 for BOVText (q80 keeps its disk footprint sane),
default quality elsewhere; nested class dirs (BOVText/DSText) are mirrored.

Usage:
  python tools/video2frame.py --input <video_dir> --output <frames_dir> [--quality 80]
"""

from __future__ import annotations

import argparse
import os

import cv2


def extract(video_path: str, save_dir: str, quality: int | None) -> int:
    os.makedirs(save_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    written = 0
    for i in range(n):
        ok, frame = cap.read()
        if not ok:
            break
        name = os.path.join(save_dir, f"{i + 1}.jpg")
        if quality is not None:
            cv2.imwrite(name, frame, [int(cv2.IMWRITE_JPEG_QUALITY), quality])
        else:
            cv2.imwrite(name, frame)
        written += 1
    cap.release()
    if written != n:
        print(f"WARNING: {video_path}: header says {n} frames, wrote {written}")
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="directory of videos (possibly nested one level)")
    ap.add_argument("--output", required=True, help="output frames root")
    ap.add_argument("--quality", type=int, default=-1, help="JPEG quality (-1 = cv2 default; BOVText uses 80)")
    args = ap.parse_args()

    quality = args.quality if args.quality > 0 else None
    videos = []
    for entry in sorted(os.listdir(args.input)):
        p = os.path.join(args.input, entry)
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if f.endswith((".mp4", ".avi")):
                    videos.append((os.path.join(p, f), os.path.join(entry, os.path.splitext(f)[0])))
        elif entry.endswith((".mp4", ".avi")):
            videos.append((p, os.path.splitext(entry)[0]))

    total = 0
    for path, rel in videos:
        save_dir = os.path.join(args.output, rel)
        n = extract(path, save_dir, quality)
        print(f"{rel}: {n} frames")
        total += n
    print(f"total frames: {total}")


if __name__ == "__main__":
    main()
