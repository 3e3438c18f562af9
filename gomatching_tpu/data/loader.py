"""Training data loaders.

Parity: ``build_vts_train_loader`` / samplers (gomatching/data/
vts_dataset_dataloader.py:27-159, custom_dataset_dataloader.py:77-151). Videos are
the sampling unit; each step yields one clip per data-parallel replica
(IMS_PER_BATCH / world_size == 1 in all shipped configs).

Supported samplers: TrainingSampler (uniform infinite shuffle),
MultiDatasetSampler (ratio-weighted multinomial across dataset sources with a
shared seed, rank-sharded), and RepeatFactorTrainingSampler (category-frequency
repeat factors, d2 semantics).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from .datasets import group_by_video, load_video_json, resolve_dataset
from .mapper import ClipMapper, ClipSample


class VideoClipLoader:
    def __init__(
        self,
        dataset_names,
        mapper: ClipMapper,
        datasets_root: str = "datasets",
        num_points: int = 25,
        sampler: str = "TrainingSampler",
        dataset_ratio: Optional[List[float]] = None,
        repeat_threshold: float = 0.0,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.mapper = mapper
        self.videos: List[List[Dict]] = []
        self.sources: List[int] = []
        for si, name in enumerate(dataset_names):
            image_root, json_file = resolve_dataset(name, datasets_root)
            records = load_video_json(json_file, image_root, num_points)
            for _, frames in sorted(group_by_video(records).items()):
                self.videos.append(frames)
                self.sources.append(si)
        if not self.videos:
            raise ValueError(f"no videos found for {dataset_names}")
        self.sampler = sampler
        self.rank = rank
        self.world_size = world_size
        self.rng = np.random.RandomState(seed)
        if sampler == "MultiDatasetSampler" and dataset_ratio:
            src = np.asarray(self.sources)
            counts = np.bincount(src, minlength=len(dataset_names)).astype(np.float64)
            ratio = np.asarray(dataset_ratio[: len(counts)], np.float64)
            w = ratio[src] / np.maximum(counts[src], 1)
            self.weights = w / w.sum()
        elif sampler == "RepeatFactorTrainingSampler":
            # d2 semantics: per-sample repeat factor max(1, sqrt(t / f_c)) over
            # the categories it contains (category frequency f_c measured over
            # samples). Text datasets are single-category, so this matters only
            # when mixing sources with an 'oversample rare source' intent.
            t = repeat_threshold
            cat_count: Dict[int, int] = {}
            vid_cats: List[set] = []
            for frames in self.videos:
                cats = {
                    a.get("category_id", 0) for f in frames for a in f.get("annotations", [])
                } or {0}
                vid_cats.append(cats)
                for c in cats:
                    cat_count[c] = cat_count.get(c, 0) + 1
            n_tot = len(self.videos)
            freq = {c: cnt / n_tot for c, cnt in cat_count.items()}
            rf = np.asarray(
                [
                    max(max(1.0, np.sqrt(t / max(freq[c], 1e-9))) for c in cats)
                    for cats in vid_cats
                ]
            )
            self.weights = rf / rf.sum()
        else:
            self.weights = None

    def __iter__(self) -> Iterator[ClipSample]:
        n = len(self.videos)
        while True:
            if self.weights is None:
                order = self.rng.permutation(n)
            else:
                order = self.rng.choice(n, size=n, replace=True, p=self.weights)
            for idx in order[self.rank :: self.world_size]:
                yield self.mapper(self.videos[idx])


def build_train_loader(cfg, rank: int = 0, world_size: int = 1) -> VideoClipLoader:
    mapper = ClipMapper(
        train_size=cfg.INPUT.TRAIN_SIZE,
        scale_range=cfg.INPUT.SCALE_RANGE,
        train_len=cfg.INPUT.VIDEO.TRAIN_LEN,
        sample_range=cfg.INPUT.VIDEO.SAMPLE_RANGE,
        dynamic_scale=cfg.INPUT.VIDEO.DYNAMIC_SCALE,
        gen_image_motion=cfg.INPUT.VIDEO.GEN_IMAGE_MOTION,
        not_clamp_box=cfg.INPUT.NOT_CLAMP_BOX,
        input_format=cfg.INPUT.FORMAT,
        train_h=cfg.INPUT.TRAIN_H,
        train_w=cfg.INPUT.TRAIN_W,
        num_points=cfg.MODEL.TRANSFORMER.NUM_POINTS,
        seed=cfg.SEED if cfg.SEED >= 0 else None,
    )
    return VideoClipLoader(
        cfg.DATASETS.TRAIN,
        mapper,
        num_points=cfg.MODEL.TRANSFORMER.NUM_POINTS,
        sampler=cfg.DATALOADER.SAMPLER_TRAIN
        if not cfg.DATALOADER.SOURCE_AWARE
        else "MultiDatasetSampler",
        dataset_ratio=cfg.DATALOADER.DATASET_RATIO,
        repeat_threshold=cfg.DATALOADER.REPEAT_THRESHOLD,
        seed=max(cfg.SEED, 0),
        rank=rank,
        world_size=world_size,
    )
