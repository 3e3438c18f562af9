#!/usr/bin/env python
"""Build a character table for non-Latin vocabularies (BOVText).

The reference ships a pickled list of 5461 unicode codepoints (``chn_cls_list``,
consumed via MODEL.TRANSFORMER.CUSTOM_DICT with VOC_SIZE=5462). This tool
generates an equivalent table from a converted train.json: every character that
appears in any transcription, sorted by codepoint, pickled as a plain list of
ints — the exact format ``utils/ctc.load_char_table`` (and the reference's
text encoder, adet/data/datasets/text.py) expects.

Usage:
  python tools/build_char_dict.py --json train.json [...] --out chn_cls_list
  # then set MODEL.TRANSFORMER.CUSTOM_DICT=chn_cls_list and
  # MODEL.TRANSFORMER.VOC_SIZE=<printed size>
"""

from __future__ import annotations

import argparse
import json
import pickle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", nargs="+", required=True, help="converted train.json file(s)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    chars = set()
    for path in args.json:
        with open(path, encoding="utf-8") as f:
            coco = json.load(f)
        for a in coco.get("annotations", []):
            t = a.get("transcription", "")
            if t and t != "###":
                chars.update(ord(c) for c in t)
    table = sorted(chars)
    with open(args.out, "wb") as f:
        pickle.dump(table, f)
    print(f"wrote {args.out}: {len(table)} characters -> set VOC_SIZE={len(table) + 1}")


if __name__ == "__main__":
    main()
