#!/usr/bin/env python
"""Video inference driver: spot + track every video under --input, emit
ICDAR-protocol XML/JSON per video and per-track transcription txt files.

CLI-compatible with the reference eval.py (same flags, same output tree:
<output>/preds/res_*.xml, <output>/jsons/*.json). See gomatching_tpu/engine for the
TPU-side pipeline structure.
"""

import argparse
import os
import sys
import time
from glob import glob

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="GoMatching-TPU video text spotting eval")
    p.add_argument("--config-file", metavar="FILE", required=True)
    p.add_argument("--cpu", action="store_true", help="Force the CPU backend")
    p.add_argument("--input", nargs="+", help="Directory of video frame dirs")
    p.add_argument("--output", required=True)
    p.add_argument("--show", action="store_true", help="Save visualizations")
    p.add_argument(
        "--profile-dir",
        default="",
        help="Capture a jax.profiler device trace into this directory",
    )
    p.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
    return p


def main():
    args = get_parser().parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor
    from gomatching_tpu.evaluation.writer import (
        boundary_to_polygon,
        frame_lines,
        write_track_transcriptions,
        write_video_results,
    )

    cfg = setup_eval_cfg(args.config_file, args.opts)

    xml_dir = os.path.join(args.output, "preds")
    json_dir = os.path.join(args.output, "jsons")
    save_dir = os.path.join(args.output, "results")
    for d in (xml_dir, json_dir, save_dir):
        os.makedirs(d, exist_ok=True)

    preded = {
        os.path.basename(p).split("res_")[-1].split(".xml")[0] for p in glob(xml_dir + "/*.xml")
    }

    assert os.path.isdir(args.input[0]), args.input
    videos_dir = args.input[0]
    if "DSText" in videos_dir:
        data_type = "DSText"
    elif "ICDAR15" in videos_dir:
        data_type = "ICDAR15"
    elif "BOVText" in videos_dir:
        data_type = "BOVText"
    else:
        data_type = "OTHER"
    video_files = []
    for v in sorted(os.listdir(videos_dir)):
        if data_type in ("DSText", "BOVText"):
            for vf in sorted(os.listdir(os.path.join(videos_dir, v))):
                video_files.append(os.path.join(videos_dir, v, vf))
        else:
            video_files.append(os.path.join(videos_dir, v))

    predictor = VideoPredictor(cfg)

    import cv2

    time_cost = {
        k: 0.0
        for k in (
            "total_time",
            "pre_process",
            "backbone",
            "detector",
            "rescore",
            "tracker",
            "long_match",
            "short_match",
            "post_process",
        )
    }
    total_frames_count = 0
    from gomatching_tpu.utils.profiling import device_trace

    trace_ctx = device_trace(args.profile_dir)
    trace_ctx.__enter__()
    for video in video_files:
        video_name = os.path.basename(video).split(".")[0]
        if video_name == "Cls1_Livestreaming_video40" or video_name in preded:
            continue
        img_paths = sorted(
            (os.path.join(video, f) for f in os.listdir(video)),
            key=lambda x: int(os.path.basename(x).split(".")[0]),
        )
        # lazy decode: frames stream through <=100-frame windows inside the
        # predictor (reference eval.py:329), so a 2000-frame BOVText video
        # never materializes on the host; --show keeps the eager list because
        # the visualizer needs every frame afterwards
        n_frames = len(img_paths)
        if args.show:
            frames = [cv2.imread(p) for p in img_paths]
        else:
            from gomatching_tpu.utils.prefetch import prefetch_iter

            # decode on a background thread so JPEG decode (~10-20 ms/frame
            # on this host) overlaps the device work instead of serializing
            # between windows; the bounded queue keeps memory O(window)
            frames = prefetch_iter((cv2.imread(p) for p in img_paths), 128)
        print(f"processing {video_name}... ({n_frames} frames)")

        t0 = time.time()
        tracked = predictor.process_video(frames, time_cost)
        elapsed = time.time() - t0
        time_cost["total_time"] += elapsed
        total_frames_count += n_frames

        annotation = {}
        for frame_id, det in enumerate(tracked):
            polys = [boundary_to_polygon(bd) for bd in det.bd]
            texts = [predictor.decode_text(r) for r in det.recs]
            annotation[str(frame_id + 1)] = frame_lines(polys, det.track_ids, texts)

        if data_type == "ICDAR15":
            parts = video_name.split("_")
            xml_name = (parts[0] + "_" + parts[1]).replace("V", "v")
        else:
            xml_name = video_name
        write_video_results(
            annotation,
            os.path.join(json_dir, f"{video_name}.json"),
            os.path.join(xml_dir, f"res_{xml_name}.xml"),
        )
        if args.show:
            from gomatching_tpu.evaluation.visualizer import save_tracked_video_frames

            save_tracked_video_frames(
                frames,
                tracked,
                os.path.join(args.output, "vis", video_name),
                decode_text=predictor.decode_text,
            )
        print(
            f"Video: {video_name} per_img_time: {elapsed / max(n_frames, 1):.4f} "
            f"FPS: {n_frames / max(elapsed, 1e-9):.2f}"
        )

    trace_ctx.__exit__(None, None, None)
    write_track_transcriptions(xml_dir)
    if time_cost["total_time"] > 0:
        print(
            f"total_time: {time_cost['total_time']:.2f} "
            f"FPS: {total_frames_count / time_cost['total_time']:.2f}"
        )
    # bucket parity note vs the reference's time_cost print
    # (gom_lstmatcher.py:273-289): backbone/rescore ride inside 'detector'
    # here — the whole spotter is ONE fused jit (a deliberate TPU design),
    # so their standalone buckets are structurally 0
    print(time_cost, "(backbone+rescore fused into detector)")


if __name__ == "__main__":
    main()
