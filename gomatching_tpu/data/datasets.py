"""Video text-spotting dataset loading (COCO-style JSON with video/instance ids).

Parity: ``load_video_json`` + ``register_vts_instances``
(gomatching/data/datasets/vts.py:24-233), without the pycocotools dependency (the
JSON is parsed directly). Per annotation we derive:
  - ``texts``: int[25] encoding of the transcription over the 36-char table
    (unknown=36, pad=37; '###'/nonalphanumeric -> [36, pad...]),
  - ``beziers`` (4, 2) centerline control points, ``boundary`` (50, 2),
    ``polyline`` (25, 2) from ``bezier_pts`` or a 4/14-point ``poly``.
Instance ids are remapped to dense 1..K (0 = untracked).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from .bezier import bezier_to_gt, poly14_to_bezier, quad_to_bezier

CTLABELS = {c: i for i, c in enumerate("abcdefghijklmnopqrstuvwxyz0123456789")}

# name -> (image_root, json_file) relative to the datasets/ dir (vts.py:216-226)
PREDEFINED_SPLITS = {
    "icdar15_train": ("ICDAR15/frame/", "ICDAR15/train.json"),
    "dstext_train": ("DSText/frame/", "DSText/train.json"),
    "artvideo_train": ("ArTVideo/Train/frame/", "ArTVideo/Train/train.json"),
    "bov_train": ("BOVText/frame/", "BOVText/train.json"),
}

_CUSTOM_DATASETS: Dict[str, tuple] = {}


def register_dataset(name: str, image_root: str, json_file: str):
    _CUSTOM_DATASETS[name] = (image_root, json_file)


def resolve_dataset(name: str, datasets_root: str = "datasets"):
    if name in _CUSTOM_DATASETS:
        return _CUSTOM_DATASETS[name]
    if "::" in name:  # ad-hoc "<image_root>::<json_file>" dataset spec
        image_root, json_file = name.split("::", 1)
        return image_root, json_file
    image_root, json_file = PREDEFINED_SPLITS[name]
    return os.path.join(datasets_root, image_root), os.path.join(datasets_root, json_file)


def encode_text(transcription, text_category=None, max_len: int = 25, voc_size: int = 37):
    text = np.full([max_len], voc_size, dtype=np.int32)
    if transcription:
        s = transcription.lower()
        if s == "###" or text_category == "nonalphanumeric":
            text[0] = voc_size - 1
        else:
            for i, ch in enumerate(s):
                if i >= max_len:
                    break
                text[i] = CTLABELS.get(ch, voc_size - 1)
    else:
        text[0] = voc_size - 1
    return text


def load_video_json(json_file: str, image_root: str, num_points: int = 25) -> List[Dict]:
    """Parse the COCO-style video json into per-frame records."""
    with open(json_file) as f:
        coco = json.load(f)

    # dense instance-id remap (vts.py:51-61)
    inst_ids = sorted({a["instance_id"] for a in coco["annotations"] if a.get("instance_id", 0) > 0})
    inst_map = {x: i + 1 for i, x in enumerate(inst_ids)}
    inst_map[0] = 0
    inst_map[-1] = 0

    anns_by_image: Dict[int, list] = {}
    for a in coco["annotations"]:
        anns_by_image.setdefault(a["image_id"], []).append(a)

    records = []
    for img in sorted(coco["images"], key=lambda x: x["id"]):
        record = {
            "file_name": os.path.join(image_root, img["file_name"]),
            "height": img["height"],
            "width": img["width"],
            "image_id": img["id"],
            "video_id": img.get("video_id", -1),
        }
        objs = []
        for anno in anns_by_image.get(img["id"], []):
            obj = {
                "bbox": anno.get("bbox"),
                "category_id": 0,
                "instance_id": inst_map.get(anno.get("instance_id", 0), 0),
                "texts": encode_text(anno.get("transcription"), anno.get("text_category")),
            }
            bez = None
            if "bezier_pts" in anno:
                bez = np.asarray(anno["bezier_pts"], np.float64).reshape(-1, 2)
            elif "poly" in anno:
                poly = np.asarray(anno["poly"], np.float64).reshape(-1, 2)
                if len(poly) == 4:
                    bez = quad_to_bezier(poly, record["height"], record["width"])
                elif len(poly) == 14:
                    bez = poly14_to_bezier(poly)
                else:
                    raise ValueError(f"unsupported polygon size {len(poly)}")
            if bez is not None:
                center, boundary, polyline = bezier_to_gt(bez, num_points)
                obj["beziers"] = center.astype(np.float32)
                obj["boundary"] = boundary.astype(np.float32)
                obj["polyline"] = polyline.astype(np.float32)
            objs.append(obj)
        record["annotations"] = objs
        records.append(record)
    return records


def group_by_video(records: List[Dict]) -> Dict[int, List[Dict]]:
    """Group frame records by video_id; still images (video_id==-1) become
    singleton pseudo-videos (vts_dataset_dataloader.py:96-136)."""
    videos: Dict[int, List[Dict]] = {}
    next_pseudo = -1
    for r in records:
        vid = r["video_id"]
        if vid == -1:
            videos[next_pseudo] = [r]
            next_pseudo -= 1
        else:
            videos.setdefault(vid, []).append(r)
    for v in videos.values():
        v.sort(key=lambda r: r["image_id"])
    return videos
