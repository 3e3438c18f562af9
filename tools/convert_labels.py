#!/usr/bin/env python
"""Convert per-dataset GT into the COCO-style train.json the loader consumes.

Parity: tools/convert_gom_label/{icdar15,dstext,bovtext}.py — one record per
frame with video_id/frame_id, one annotation per instance with instance_id
('ID'), quad 'poly', 'transcription', 'text_category' and a bbox. ICDAR15 and
DSText ship per-video GT XML (<frame ID><object ID Transcription Language>
<Point x y>); BOVText ships per-video JSON ({frame: [{ID, transcription,
language, points}]}). '##DONT#CARE##' maps to '###'; non-Latin languages map
to text_category='nonalphanumeric' so the text encoder emits the unk token.

Usage:
  python tools/convert_labels.py --dataset icdar15 --gt <gt_dir> \
      --frames <frames_dir> --out train.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import xml.etree.cElementTree as ET

import cv2

LATIN = {"English", "Catalan", "Spanish", "French"}


def _category(transcription: str, language: str = ""):
    if transcription == "##DONT#CARE##":
        return "###", "other"
    if not language or language in LATIN:
        return transcription, "alphanumeric"
    return transcription, "nonalphanumeric"


def _frame_size(frames_dir: str, video: str):
    img = cv2.imread(os.path.join(frames_dir, video, "1.jpg"))
    if img is None:
        raise FileNotFoundError(f"no frames for video {video} under {frames_dir}")
    return img.shape[:2], len(glob.glob(os.path.join(frames_dir, video, "*.jpg")))


def _new_out():
    return {
        "images": [],
        "annotations": [],
        "categories": [{"supercategory": "text", "id": 1, "name": "text"}],
        "videos": [],
    }


def convert_xml(gt_dir: str, frames_dir: str):
    """ICDAR15 / DSText: one GT xml per video."""
    out = _new_out()
    img_id = ann_id = video_id = 0
    for xml_file in sorted(f for f in os.listdir(gt_dir) if f.endswith(".xml")):
        video_id += 1
        video = xml_file.split("_GT")[0].replace(".xml", "")
        out["videos"].append({"id": video_id, "file_name": video})
        (h, w), num_images = _frame_size(frames_dir, video)
        root = ET.parse(os.path.join(gt_dir, xml_file)).getroot()
        for frame in root.findall("frame"):
            frame_id = int(frame.attrib["ID"])
            img_id += 1
            out["images"].append(
                {
                    "file_name": f"{video}/{frame_id}.jpg",
                    "id": img_id,
                    "height": h,
                    "width": w,
                    "frame_id": frame_id,
                    "prev_image_id": img_id - 1 if frame_id > 1 else -1,
                    "next_image_id": img_id + 1 if frame_id < num_images else -1,
                    "video_id": video_id,
                }
            )
            seen = set()
            for obj in frame.findall("object"):
                inst = int(obj.attrib["ID"])
                if inst in seen:  # duplicated ids within a frame are dropped
                    continue
                seen.add(inst)
                transcription, cat = _category(
                    obj.attrib.get("Transcription", ""), obj.attrib.get("Language", "")
                )
                poly = []
                for p in obj.findall("Point"):
                    poly += [int(p.attrib["x"]), int(p.attrib["y"])]
                xs, ys = poly[0::2], poly[1::2]
                ann_id += 1
                out["annotations"].append(
                    {
                        "id": ann_id,
                        "category_id": 1,
                        "image_id": img_id,
                        "instance_id": inst,
                        "bbox": [min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys)],
                        "poly": poly,
                        "transcription": transcription,
                        "text_category": cat,
                        "iscrowd": 0,
                        "area": (max(xs) - min(xs)) * (max(ys) - min(ys)),
                    }
                )
    return out


def convert_bovtext(gt_dir: str, frames_dir: str):
    """BOVText: Cls*/video.json files of {frame: [objects]}."""
    out = _new_out()
    img_id = ann_id = video_id = 0
    for cls_dir in sorted(os.listdir(gt_dir)):
        sub = os.path.join(gt_dir, cls_dir)
        if not os.path.isdir(sub):
            continue
        for jf in sorted(f for f in os.listdir(sub) if f.endswith(".json")):
            video_id += 1
            video = os.path.splitext(jf)[0]
            rel = os.path.join(cls_dir, video)
            out["videos"].append({"id": video_id, "file_name": video})
            (h, w), num_images = _frame_size(frames_dir, rel)
            with open(os.path.join(sub, jf), encoding="utf-8") as f:
                frames = json.load(f)
            for frame_key in sorted(frames, key=int):
                frame_id = int(frame_key)
                img_id += 1
                out["images"].append(
                    {
                        "file_name": f"{rel}/{frame_id}.jpg",
                        "id": img_id,
                        "height": h,
                        "width": w,
                        "frame_id": frame_id,
                        "prev_image_id": img_id - 1 if frame_id > 1 else -1,
                        "next_image_id": img_id + 1 if frame_id < num_images else -1,
                        "video_id": video_id,
                    }
                )
                for obj in frames[frame_key]:
                    transcription, cat = _category(
                        obj.get("transcription", ""), obj.get("language", "")
                    )
                    poly = [int(round(float(v))) for v in obj["points"]]
                    xs, ys = poly[0::2], poly[1::2]
                    ann_id += 1
                    out["annotations"].append(
                        {
                            "id": ann_id,
                            "category_id": 1,
                            "image_id": img_id,
                            "instance_id": int(obj["ID"]),
                            "bbox": [min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys)],
                            "poly": poly,
                            "transcription": transcription,
                            "text_category": cat,
                            "iscrowd": 0,
                            "area": (max(xs) - min(xs)) * (max(ys) - min(ys)),
                        }
                    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=("icdar15", "dstext", "bovtext"), required=True)
    ap.add_argument("--gt", required=True, help="GT dir (XMLs, or Cls*/json for bovtext)")
    ap.add_argument("--frames", required=True, help="extracted frames root")
    ap.add_argument("--out", required=True, help="output train.json")
    args = ap.parse_args()

    if args.dataset == "bovtext":
        out = convert_bovtext(args.gt, args.frames)
    else:
        out = convert_xml(args.gt, args.frames)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(
        f"wrote {args.out}: {len(out['videos'])} videos, "
        f"{len(out['images'])} frames, {len(out['annotations'])} annotations"
    )


if __name__ == "__main__":
    main()
