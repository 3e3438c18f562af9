#!/usr/bin/env python
"""Training driver for the GoMatching tracker head (spotter frozen).

CLI-compatible with the reference train_net.py: --config-file, --resume, --opts.
Flow parity (train_net.py:50-156): freeze policy -> optimizer -> checkpoint
resume -> rescoring-head init from the spotter classifier -> iteration loop with
loss logging, LR schedule, periodic checkpointing. TPU-first: the step is the
3-phase Trainer (jit spotter fwd -> host Hungarian/GT -> jit loss+grad+update).
"""

import argparse
import json
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True, metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-gpus", "--num-chips", type=int, default=1, dest="num_chips",
                   help="data-parallel width; default 1 (single chip, matching the "
                   "reference CLI's --num-gpus=1); 0 = all visible devices")
    p.add_argument("--num-machines", type=int, default=1,
                   help="number of hosts in a multi-host run (reference "
                   "train_net.py:198-208 DDP launch); >1 triggers "
                   "jax.distributed.initialize()")
    p.add_argument("--machine-rank", type=int, default=0,
                   help="this host's process index (reference machine_rank)")
    p.add_argument("--dist-url", default="auto",
                   help="coordinator address, reference dist_url style "
                   "(tcp://host:port or host:port); 'auto' = env-driven "
                   "(TPU pods publish coordination env vars)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--max-iter", type=int, default=-1, help="override for smoke runs")
    p.add_argument(
        "--task",
        choices=("tracker", "spotter"),
        default="tracker",
        help="tracker = GoMatching training (spotter frozen, the reference's "
        "train_net.py); spotter = DeepSolo image-spotter pretraining "
        "(TransformerPureDetector path, full-model)",
    )
    p.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
    return p


def normalize_clip(sample, pixel_mean, pixel_std, pad_multiple: int = 32,
                   canvas=None, pad_t: int = 0, raw: bool = False):
    """Stack clip frames -> (T, Hp, Wp, 3) normalized; return true (h, w).

    ``canvas``/``pad_t`` force a common (Hp, Wp)/frame count so clips from
    different videos can stack on a sharded leading axis (SPMD path).
    ``raw``: ship uint8 pixels instead (TPU.TRAIN_UPLOAD_UINT8) — the trainer
    normalizes + re-zeroes padding in-graph (normalize_wire_frames), the
    reference's own device-side order (gom_lstmatcher.py:159-169)."""
    h, w = sample.image_hw
    hp = -(-max(h, canvas[0] if canvas else 0) // pad_multiple) * pad_multiple
    wp = -(-max(w, canvas[1] if canvas else 0) // pad_multiple) * pad_multiple
    t = max(len(sample.images), pad_t)
    if raw:
        batch = np.zeros((t, hp, wp, 3), np.uint8)
        for i, img in enumerate(sample.images):
            batch[i, :h, :w] = np.clip(np.rint(img), 0, 255).astype(np.uint8)
        return batch, (h, w)
    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    batch = np.zeros((t, hp, wp, 3), np.float32)
    for i, img in enumerate(sample.images):
        batch[i, :h, :w] = (img - mean) / std
    return batch, (h, w)


def targets_from_sample(sample):
    """Normalize GT to [0,1] coords (GoMatching.prepare_targets,
    gom_lstmatcher.py:192-211 + _get_boxes_time :478-495)."""
    h, w = sample.image_hw
    scale = np.asarray([w, h], np.float32)
    return {
        "gt_ctrl": [c / scale for c in sample.gt_ctrl],
        "gt_boxes": [b / np.asarray([w, h, w, h], np.float32) for b in sample.gt_boxes],
        "gt_ids": sample.gt_ids,
        "gt_texts": sample.gt_texts,
    }


def init_rescoring_from_classifier(params):
    """Copy the spotter's ctrl_point_class weights into the rescoring head
    (train_net.py:97-105) — done whenever the checkpoint is not already a
    GoMatching one ('_rescore' marker in the weights path)."""
    src = params["params"]["detection_transformer"]["ctrl_point_class"]
    dst = params["params"]["roi_heads"]["rescoring_head"]
    dst["kernel"] = np.asarray(src["kernel"]).copy()
    dst["bias"] = np.asarray(src["bias"]).copy()
    return params


def pretrain_video_main(args, cfg):
    """Video-spotter pretraining (META_ARCHITECTURE: TransformerPureVideoDetector,
    video_text_spotter.py:106): whole clips batch through the spotter with
    per-frame SetCriterion targets from the video clip mapper."""
    from gomatching_tpu.data.loader import build_train_loader
    from gomatching_tpu.engine.checkpoint import save_params
    from gomatching_tpu.engine.pretrain import SpotterPretrainer, build_video_spotter_targets

    t = cfg.MODEL.TRANSFORMER
    trainer = SpotterPretrainer(cfg)
    loader = build_train_loader(cfg)
    max_iter = args.max_iter if args.max_iter > 0 else cfg.SOLVER.MAX_ITER
    ckpt_dir = os.path.join(cfg.OUTPUT_DIR, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    it = iter(loader)
    for i in range(max_iter):
        sample = next(it)
        images, (h, w) = normalize_clip(
            sample, cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
            raw=bool(cfg.TPU.TRAIN_UPLOAD_UINT8),
        )
        targets = build_video_spotter_targets(sample, cfg.TPU.MAX_GT, t.NUM_POINTS, t.VOC_SIZE)
        hw = np.tile(np.asarray([h, w], np.float32)[None], (len(images), 1))
        metrics = trainer.step(images, targets, image_hw=hw)
        if (i + 1) % 20 == 0:
            print(f"iter {i + 1}/{max_iter} total {metrics['total_loss']:.4f}")
        if (i + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or (i + 1) == max_iter:
            save_params(os.path.join(ckpt_dir, f"spotter_{i + 1:07d}.npz"), trainer.state.params)


def pretrain_main(args):
    """DeepSolo image-spotter pretraining loop (--task spotter)."""
    import cv2
    import jax

    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.data.datasets import load_video_json, resolve_dataset
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.pretrain import SpotterPretrainer, build_spotter_targets
    from gomatching_tpu.models.gomatching import build_pretrain_model

    cfg = setup_train_cfg(args.config_file, args.opts)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    # pretraining differentiates THROUGH the spotter: build_pretrain_model
    # selects cfg.TPU.TRAIN_SAMPLING_IMPL ('tiled' XLA default, or 'vmem' —
    # the fused kernels carry custom-VJP fused backwards since round 4)
    if cfg.MODEL.META_ARCHITECTURE == "TransformerPureVideoDetector":
        return pretrain_video_main(args, cfg)
    t = cfg.MODEL.TRANSFORMER
    model = build_pretrain_model(cfg)
    params = init_params(model)
    trainer = SpotterPretrainer(cfg, model, params)

    records = []
    for name in cfg.DATASETS.TRAIN:
        image_root, json_file = resolve_dataset(name)
        records.extend(load_video_json(json_file, image_root, t.NUM_POINTS, voc_size=t.VOC_SIZE))
    print(f"pretraining on {len(records)} images")

    max_iter = args.max_iter if args.max_iter > 0 else cfg.SOLVER.MAX_ITER
    max_gt = cfg.TPU.MAX_GT
    size = cfg.INPUT.TRAIN_SIZE
    rng = np.random.RandomState(cfg.SEED if cfg.SEED > 0 else 0)
    ckpt_dir = os.path.join(cfg.OUTPUT_DIR, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    from gomatching_tpu.data.image_augment import augment_pretrain_record

    for i in range(max_iter):
        rec = records[int(rng.randint(len(records)))]
        img = cv2.imread(rec["file_name"])
        if img is None:
            continue
        if cfg.INPUT.FORMAT == "RGB":
            img = img[:, :, ::-1]
        # adet image-mapper chain: rotate -> instance-aware crop -> resize
        # (dataset_mapper.py:93-110)
        img, annos = augment_pretrain_record(
            img,
            rec,
            rng,
            rotate=cfg.INPUT.ROTATE,
            crop_enabled=cfg.INPUT.CROP.ENABLED,
            crop_frac=tuple(cfg.INPUT.CROP.SIZE),
            crop_instance=cfg.INPUT.CROP.CROP_INSTANCE,
            angle=45.0 if t.BOUNDARY_HEAD else 90.0,
        )
        aug_rec = {"height": img.shape[0], "width": img.shape[1], "annotations": annos}
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        if cfg.TPU.TRAIN_UPLOAD_UINT8:
            # raw uint8 wire; no padding at (size, size) so no hw mask needed
            images = np.ascontiguousarray(
                np.clip(np.rint(img), 0, 255).astype(np.uint8)
            )[None]
        else:
            images = ((img.astype(np.float32) - np.asarray(cfg.MODEL.PIXEL_MEAN)) /
                      np.asarray(cfg.MODEL.PIXEL_STD))[None]
        targets = build_spotter_targets(aug_rec, max_gt, t.NUM_POINTS, t.VOC_SIZE)
        targets = {k: v[None] for k, v in targets.items()}
        metrics = trainer.step(images, targets)
        if (i + 1) % 20 == 0:
            print(f"iter {i + 1}/{max_iter} total {metrics['total_loss']:.4f}")
        if (i + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or (i + 1) == max_iter:
            from gomatching_tpu.engine.checkpoint import save_params

            save_params(os.path.join(ckpt_dir, f"spotter_{i + 1:07d}.npz"), trainer.state.params)


def maybe_init_distributed(args):
    """Multi-host SPMD bring-up, the reference's multi-machine DDP launch
    (train_net.py:198-208: --num-machines / machine_rank / tcp dist_url).

    TPU-first shape: one ``jax.distributed.initialize()`` per host, after which
    ``jax.devices()`` is GLOBAL and the existing ('data','model') mesh +
    GSPMD collectives span hosts unchanged (ICI within a slice, DCN across) —
    no per-rank gradient plumbing like torch DDP. Must run before any other
    JAX call. 'auto' on a TPU pod uses the env-published coordinator."""
    if args.num_machines <= 1:
        return
    import jax

    if args.dist_url == "auto":
        # TPU pods (and SLURM/OpenMPI launchers) publish coordinator/process
        # env vars that jax.distributed reads natively
        jax.distributed.initialize()
    else:
        addr = args.dist_url
        if addr.startswith("tcp://"):
            addr = addr[len("tcp://"):]
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=args.num_machines,
            process_id=args.machine_rank,
        )
    print(
        f"multi-host: process {jax.process_index()}/{jax.process_count()} up, "
        f"{len(jax.devices())} global devices"
    )


def main():
    args = get_parser().parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    maybe_init_distributed(args)
    if args.task == "spotter":
        return pretrain_main(args)
    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.data.loader import build_train_loader
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.models.gomatching import build_model

    cfg = setup_train_cfg(args.config_file, args.opts)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())

    model = build_model(cfg)
    weights = cfg.MODEL.WEIGHTS
    if weights and os.path.exists(weights):
        from gomatching_tpu.engine.checkpoint import load_params

        params = load_params(weights)
        if "_rescore" not in weights and cfg.MODEL.ROI_HEADS.WITH_RESR:
            params = init_rescoring_from_classifier(params)
        print(f"loaded weights from {weights}")
    else:
        params = init_params(model)
        if cfg.MODEL.ROI_HEADS.WITH_RESR:
            params = init_rescoring_from_classifier(params)
        print("no pretrained weights found - training from random init")

    import jax

    # SPMD data-parallel mesh over clips (reference DDP launch equivalent,
    # train_net.py:186-209): one clip per 'data' slot per iteration
    n_dev = len(jax.devices())
    width = args.num_chips if args.num_chips > 0 else n_dev
    mesh = None
    if width > 1:
        from gomatching_tpu.parallel import build_mesh

        mesh = build_mesh(devices=jax.devices()[:width])
        print(f"data-parallel mesh over {width} devices")
    trainer = Trainer(cfg, model, params, mesh=mesh)
    n_train = sum(x.size for x in __import__("jax").tree.leaves(trainer.state.trainable))
    n_total = n_train + sum(x.size for x in __import__("jax").tree.leaves(trainer.state.frozen))
    print(f"trainable params: {n_train / 1e6:.2f}M / total {n_total / 1e6:.2f}M")

    loader = build_train_loader(cfg)
    max_iter = args.max_iter if args.max_iter > 0 else cfg.SOLVER.MAX_ITER
    ckpt_dir = os.path.join(cfg.OUTPUT_DIR, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    metrics_path = os.path.join(cfg.OUTPUT_DIR, "metrics.json")

    start_iter = 0
    if args.resume:
        from gomatching_tpu.engine.checkpoint import latest_train_state, load_train_state
        from gomatching_tpu.engine.train import TrainState

        path, step = latest_train_state(ckpt_dir)
        if path:
            restored = load_train_state(
                path,
                target={
                    "trainable": trainer.state.trainable,
                    "opt_state": trainer.state.opt_state,
                },
            )
            import jax.numpy as jnp

            trainer.state = TrainState(
                trainable=restored["trainable"],
                frozen=trainer.state.frozen,
                opt_state=restored["opt_state"],
                step=jnp.asarray(step, jnp.int32),
            )
            start_iter = step
            print(f"resumed from {path} at iteration {step}")

    # tensorboard scalars next to the JSON metrics (reference: TensorboardXWriter
    # on rank 0, train_net.py:79-87); optional — skipped if unavailable
    tb = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(os.path.join(cfg.OUTPUT_DIR, "tb"))
    except Exception:
        pass

    it = iter(loader)
    data_t, step_t = 0.0, 0.0
    log_every = 20
    raw = bool(cfg.TPU.TRAIN_UPLOAD_UINT8)
    # double-buffered uploads: decode + ship clip i+1 while the device runs
    # step i, and fetch metrics one iteration late (one RPC for the stacked
    # vector). Numerically identical to the sequential loop.
    overlap = mesh is None and bool(cfg.TPU.TRAIN_OVERLAP_UPLOAD)

    def prep_clip():
        sample = next(it)
        images, (h, w) = normalize_clip(
            sample, cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD, raw=raw
        )
        hw = (np.tile(np.asarray([h, w], np.float32)[None], (len(images), 1))
              if raw else None)
        if raw and cfg.TPU.TRAIN_UPLOAD_FORMAT == "yuv420":
            from gomatching_tpu.engine.train import encode_train_clip

            images = encode_train_clip(images, cfg.INPUT.FORMAT)
        return images, hw, targets_from_sample(sample)

    with open(metrics_path, "a") as mf:
        def record(idx, metrics):
            nonlocal data_t, step_t
            assert np.isfinite(metrics["total_loss"]), \
                f"loss diverged at iter {idx}: {metrics}"
            if (idx + 1) % log_every != 0:
                return
            lr = float(trainer.schedule(idx))
            line = {
                "iteration": idx + 1,
                "lr": lr,
                "data_time": data_t / log_every,
                "time": step_t / log_every,
                **metrics,
            }
            mf.write(json.dumps(line) + "\n")
            mf.flush()
            if tb is not None:
                for k, v in line.items():
                    if isinstance(v, (int, float)):
                        tb.add_scalar(k, v, idx + 1)
            print(
                f"iter {idx + 1}/{max_iter} loss {metrics['total_loss']:.4f} "
                f"res {metrics.get('loss_res', 0):.4f} long {metrics['loss_long_asso']:.4f} "
                f"short {metrics['loss_short_asso']:.4f} lr {lr:.2e} "
                f"({step_t / log_every:.2f}s/it, data {data_t / log_every:.2f}s)"
            )
            data_t, step_t = 0.0, 0.0

        def maybe_checkpoint(idx):
            if (idx + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or (idx + 1) == max_iter:
                from gomatching_tpu.engine.checkpoint import save_params, save_train_state
                from gomatching_tpu.engine.train import merge_params

                save_params(
                    os.path.join(ckpt_dir, f"model_{idx + 1:07d}_rescore.npz"),
                    merge_params(
                        trainer.state.trainable,
                        trainer.frozen_f32
                        if trainer.frozen_f32 is not None
                        else trainer.state.frozen,
                    ),
                )
                save_train_state(
                    ckpt_dir,
                    idx + 1,
                    {
                        "trainable": trainer.state.trainable,
                        "opt_state": trainer.state.opt_state,
                    },
                )
                print(f"saved checkpoint at iter {idx + 1}")

        pending = None  # (iter idx, deferred metrics handle) — overlap mode
        targets = None  # GT of the already-dispatched spot forward
        if overlap and max_iter > start_iter:
            from gomatching_tpu.engine.train import fetch_metrics

            # prime the pipeline: clip 0's spot forward goes on the device
            # queue now; every later spot is dispatched by step_finish's
            # begin_next so its compute hides behind the FULL inter-iteration
            # host window (metrics drain, clip decode/upload, meta fetch)
            t0 = time.time()
            imgs, hw0, targets = prep_clip()
            trainer.step_begin(trainer.put_clip(imgs), hw0)
            data_t += time.time() - t0
        for i in range(start_iter, max_iter):
            t0 = time.time()
            if overlap:
                # device busy with the spot forward: drain last iter's
                # metrics, then decode + upload the NEXT clip over the wire
                if pending is not None:
                    record(pending[0], fetch_metrics(pending[1]))
                    pending = None
                td0 = time.time()
                nxt = None
                if i + 1 < max_iter:
                    imgs, hw2, tgts2 = prep_clip()
                    nxt = (trainer.put_clip(imgs), hw2, tgts2)
                td = time.time() - td0
                pending = (i, trainer.step_finish(
                    targets, blocking=False,
                    begin_next=None if nxt is None else (nxt[0], nxt[1]),
                ))
                if nxt is not None:
                    targets = nxt[2]
                maybe_checkpoint(i)
                data_t += td
                step_t += time.time() - t0 - td
                continue
            if mesh is None:
                images, hw, targets = prep_clip()
                data_t += time.time() - t0
                t0 = time.time()
                metrics = trainer.step(images, hw, targets)
            else:
                samples = [next(it) for _ in range(mesh.shape["data"])]
                canvas = (
                    max(s_.image_hw[0] for s_ in samples),
                    max(s_.image_hw[1] for s_ in samples),
                )
                t_max = max(len(s_.images) for s_ in samples)
                clips = []
                for s_ in samples:
                    imgs, _ = normalize_clip(
                        s_, cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
                        canvas=canvas, pad_t=t_max,
                        raw=bool(cfg.TPU.TRAIN_UPLOAD_UINT8),
                    )
                    tg = targets_from_sample(sample=s_)
                    t_real = len(s_.images)
                    npts = tg["gt_ctrl"][0].shape[1] if tg["gt_ctrl"] else 25
                    for _ in range(t_max - t_real):
                        tg["gt_ctrl"].append(np.zeros((0, npts, 2), np.float32))
                        tg["gt_boxes"].append(np.zeros((0, 4), np.float32))
                        tg["gt_ids"].append(np.zeros((0,), np.int64))
                        tg["gt_texts"].append([])
                    tg["frame_valid"] = np.arange(t_max) < t_real
                    hw = np.tile(np.asarray(s_.image_hw, np.float32)[None], (t_max, 1))
                    clips.append((imgs, hw, tg))
                data_t += time.time() - t0
                t0 = time.time()
                metrics = trainer.step_multi(clips)
            step_t += time.time() - t0
            record(i, metrics)
            maybe_checkpoint(i)
        if pending is not None:
            from gomatching_tpu.engine.train import fetch_metrics

            record(pending[0], fetch_metrics(pending[1]))


if __name__ == "__main__":
    main()
