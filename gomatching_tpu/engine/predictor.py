"""Video inference engine.

Replaces ``GoMBatchPredictor`` (gomatching/text_track_visualizer.py:295-335) and the
driver loop of the reference ``eval.py``. TPU-first structure:

  - the spotter runs BATCHED over SPOT_BATCH frames per device step (the reference
    pushes batch-size-1 through the network per frame, gom_lstmatcher.py:370 — frame
    batching is the single biggest TPU throughput win, SURVEY.md §7.8);
  - detections come back as fixed (B, nq, ...) slot arrays + validity mask; the
    host extracts dense per-frame instances;
  - the sequential tracker calls the jitted association transformer with
    bucket-padded token counts (compilation reuse across frames).

Stage wall-clock is tracked in the same ``time_cost`` buckets the reference prints
(eval.py:303-304) for parity reporting.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocess import preprocess_frames
from ..models.gomatching import GoMatchingModel, build_model
from ..tracking.tracker import FrameDetections, Tracker
from ..utils.ctc import ctc_decode, load_char_table


def cast_frozen_params(params, dtype):
    """Cast the frozen spotter subtrees (backbone + detection_transformer) to the
    compute dtype so the whole frozen path runs in bf16 (flax promotes mixed
    f32-param/bf16-input Dense back to f32, so a cast at load time is required)."""
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    p = dict(params["params"])
    for k in ("backbone", "detection_transformer"):
        if k in p:
            p[k] = jax.tree.map(lambda x: x.astype(dt), p[k])
    return {"params": p}


# matcher-only subtrees of the tracker head (NOT reid/rescore, which feed the
# spot program and stay f32 — gomatching.py:220 casts reid inputs to f32)
_ASSOC_SUBTREES = (
    "long_term_matcher",
    "short_term_matcher",
    "shared_matcher",
    "asso_predictor",
    "local_asso_predictor",
)


def cast_assoc_params(params, dtype):
    """Cast the association matcher subtrees to the compute dtype (see
    TPU.ASSOC_PRECISION). Non-matcher leaves are shared, not copied."""
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    p = dict(params["params"])
    if "roi_heads" in p:
        t = dict(p["roi_heads"])
        for k in _ASSOC_SUBTREES:
            if k in t:
                t[k] = jax.tree.map(lambda x: x.astype(dt), t[k])
        p["roi_heads"] = t
    return {"params": p}


def init_params(model: GoMatchingModel, seed: int = 0, image_size=None):
    """Random-init the full parameter tree.

    Always traces on the host CPU backend — initializing via a TPU compile of the
    whole model wastes minutes of compile time for throwaway math; the params are
    transferred to the accelerator lazily at the first jitted call.
    """
    if image_size is None:
        # the two-stage top-k needs at least num_queries encoder tokens
        side = 64
        while sum((-(-side // s)) ** 2 for s in (8, 16, 32, 64)) < model.num_queries:
            side *= 2
        image_size = (side, side)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() != "cpu":
        with jax.default_device(cpu):
            imgs = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
            return model.init(jax.random.PRNGKey(seed), imgs)
    imgs = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), imgs)


class VideoPredictor:
    """End-to-end per-video spotting + tracking."""

    def __init__(self, cfg, params=None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh with a 'data' axis — spot batches
        shard their frame axis across it (TPU.SPOT_BATCH should be a multiple of
        the axis size)."""
        self.cfg = cfg
        self.mesh = mesh
        self.model = build_model(cfg)
        if params is None:
            params = self._load_or_init(cfg)
        if cfg.MODEL.PRECISION == "bfloat16":
            params = cast_frozen_params(params, "bfloat16")
        # init traces on the host CPU for compile speed, which leaves the params
        # COMMITTED to the CPU device — jit would then re-transfer every call
        # (catastrophic through a tunneled TPU: ~2.3 s/step for ResNet-50 alone).
        # Pin them to the accelerator once (replicated across the mesh if any).
        if mesh is not None:
            from ..parallel import shard_params

            self.params = shard_params(params, mesh)
        else:
            self.params = jax.device_put(params, jax.devices()[0])
        self.spot_batch = cfg.TPU.SPOT_BATCH
        self.spot_super = max(1, int(getattr(cfg.TPU, "SPOT_SUPER", 1)))
        # detection threshold: a traced scalar so callers (e.g. bench calibration)
        # can adjust it without recompiling the spot program
        self.score_thresh = float(cfg.MODEL.TRANSFORMER.INFERENCE_TH_TEST)
        self.char_table = load_char_table(
            cfg.MODEL.TRANSFORMER.VOC_SIZE, cfg.MODEL.TRANSFORMER.CUSTOM_DICT
        )
        self.voc_size = cfg.MODEL.TRANSFORMER.VOC_SIZE

        self._spot_fn = jax.jit(
            lambda p, imgs, hw: self.model.apply(p, imgs, hw, method=GoMatchingModel.spot_and_detect)
        )
        self._raw_spot_fns = {}  # (in_h, in_w) -> jitted uint8-raw-frames spot fn
        self._concat_fns = {}  # n_chunks -> jitted device-side concat
        self.upload_format = getattr(cfg.TPU, "UPLOAD_FORMAT", "rgb")
        self.meta_topk = int(getattr(cfg.TPU, "META_TOPK", 0))
        use_pos = not cfg.MODEL.ASSO_HEAD.NO_POS_EMB
        # bf16 association matcher (TPU.ASSOC_PRECISION; compute-bound pass,
        # see config.py) — gated off for the interpolated-pos-emb path, whose
        # f32 pos adds would promote the matmuls back to f32 anyway
        assoc_prec = getattr(cfg.TPU, "ASSOC_PRECISION", "") or cfg.MODEL.PRECISION
        self.assoc_bf16 = assoc_prec == "bfloat16" and not use_pos
        if self.assoc_bf16:
            self._assoc_params = jax.jit(
                lambda p: cast_assoc_params(p, "bfloat16")
            )(self.params)
        else:
            self._assoc_params = self.params
        # indexed association (TPU.ASSOC_INDEXED): reid rows stay device-
        # resident; the tracker ships row indices. Mesh inference keeps the
        # fetch path (the pool would need explicit shardings).
        self.assoc_indexed = bool(getattr(cfg.TPU, "ASSOC_INDEXED", True)) and mesh is None
        self._pool = None  # device-resident (P, F) reid pool of the live window(s)
        if self.assoc_indexed:
            def make_rows_fn(short):
                if use_pos:
                    def fn(p, pool, rows, valid, bx, tm):
                        toks = jnp.take(pool, rows, axis=0)
                        return self.model.apply(
                            p, toks, valid, short, False, bx, tm,
                            method=GoMatchingModel.associate,
                        )
                else:
                    def fn(p, pool, rows, valid, out_rows=None):
                        toks = jnp.take(pool, rows, axis=0)
                        if self.assoc_bf16:
                            toks = toks.astype(jnp.bfloat16)
                        out = self.model.apply(
                            p, toks, valid, short, method=GoMatchingModel.associate
                        )
                        out = out.astype(jnp.float32)
                        # fetch-byte cut: the tracker only reads the LAST
                        # frame's rows of each request's (npad, npad) logits —
                        # slice them on device so the host round trip ships
                        # (B, kpad, npad) instead of (B, npad, npad). Same f32
                        # values (a pure take_along_axis), so ids stay
                        # bit-identical; the tunnel moves ~35 MB/s, and a
                        # 32-padded long-match round was ~2 MB (~60 ms) of
                        # which ~threefourths was never read.
                        if out_rows is not None:
                            out = jnp.take_along_axis(out, out_rows[:, :, None], axis=1)
                        return out
                return jax.jit(fn)

            self._assoc_rows_short = make_rows_fn(True)
            self._assoc_rows_long = make_rows_fn(False)
            if use_pos:
                def associate_fn(rows, valid, short_term, boxes=None, times=None):
                    fn = self._assoc_rows_short if short_term else self._assoc_rows_long
                    return fn(self._assoc_params, self._pool, rows, valid, boxes, times)
            else:
                def associate_fn(rows, valid, short_term, out_rows=None):
                    fn = self._assoc_rows_short if short_term else self._assoc_rows_long
                    return fn(self._assoc_params, self._pool, rows, valid, out_rows)

                associate_fn.supports_out_rows = True
        elif use_pos:
            self._assoc_short = jax.jit(
                lambda p, toks, valid, bx, tm: self.model.apply(
                    p, toks, valid, True, False, bx, tm, method=GoMatchingModel.associate
                )
            )
            self._assoc_long = jax.jit(
                lambda p, toks, valid, bx, tm: self.model.apply(
                    p, toks, valid, False, False, bx, tm, method=GoMatchingModel.associate
                )
            )

            def associate_fn(tokens, valid, short_term, boxes=None, times=None):
                fn = self._assoc_short if short_term else self._assoc_long
                return fn(self._assoc_params, tokens, valid, boxes, times)
        else:
            def make_tok_fn(short):
                def fn(p, toks, valid, out_rows=None):
                    if self.assoc_bf16:
                        toks = toks.astype(jnp.bfloat16)
                    out = self.model.apply(
                        p, toks, valid, short, method=GoMatchingModel.associate
                    )
                    out = out.astype(jnp.float32)
                    if out_rows is not None:  # see make_rows_fn: sliced fetch
                        out = jnp.take_along_axis(out, out_rows[:, :, None], axis=1)
                    return out
                return jax.jit(fn)

            self._assoc_short = make_tok_fn(True)
            self._assoc_long = make_tok_fn(False)

            def associate_fn(tokens, valid, short_term, out_rows=None):
                fn = self._assoc_short if short_term else self._assoc_long
                return fn(self._assoc_params, tokens, valid, out_rows)

            associate_fn.supports_out_rows = True

        v = cfg.VIDEO_TEST
        self.tracker = Tracker(
            associate_fn,
            test_len=cfg.INPUT.VIDEO.TEST_LEN,
            overlap_thresh=v.OVERLAP_THRESH,
            min_track_len=v.MIN_TRACK_LEN,
            max_center_dist=v.MAX_CENTER_DIST,
            decay_time=v.DECAY_TIME,
            with_iou=v.WITH_IOU,
            not_mult_thresh=v.NOT_MULT_THRESH,
            use_pos_emb=use_pos,
            with_temp_emb=cfg.MODEL.ASSO_HEAD.WITH_TEMP_EMB,
            indexed=self.assoc_indexed,
        )

    def _load_or_init(self, cfg):
        path = cfg.MODEL.WEIGHTS
        if path:
            import os

            if os.path.exists(path):
                from .checkpoint import load_params

                params = load_params(path)
                self._warn_halo_risk(cfg, params)
                return params
        return init_params(self.model)

    @staticmethod
    def _warn_halo_risk(cfg, params):
        """Loaded (trained) weights can have learned sampling offsets beyond
        TILED_HALO, silently degrading the tiled/vmem samplers' exactness. The
        offset bias is in target-cell units — a cheap necessary signal (the
        data-dependent part needs tools/certify_halo.py on real frames)."""
        if cfg.TPU.SAMPLING_IMPL not in ("tiled", "vmem"):
            return
        import jax

        halo = cfg.TPU.TILED_HALO
        worst = 0.0
        for path_k, leaf in jax.tree_util.tree_leaves_with_path(params):
            keys = "/".join(str(getattr(p, "key", p)) for p in path_k)
            if "sampling_offsets" in keys and keys.endswith("bias"):
                worst = max(worst, float(abs(np.asarray(leaf)).max()))
        if worst > halo:
            print(
                f"WARNING: checkpoint sampling-offset bias reaches {worst:.1f} "
                f"target cells > TPU.TILED_HALO={halo}; the tiled/vmem encoder "
                "sampler drops attention mass beyond the halo. Run "
                "tools/certify_halo.py on real frames, then raise TPU.TILED_HALO "
                "or set TPU.SAMPLING_IMPL=xla.",
                file=sys.stderr,
            )

    def _raw_spot_fn(self, orig_hw: tuple, target_hw: tuple, nmap: int = 1):
        """Jitted uint8-raw-frames -> detections fn (resize+normalize on device);
        cached per input resolution (static shapes under jit). Under a mesh the
        frame-batch axis is sharded over 'data' (the inference analogue of the
        reference's single-GPU-per-video loop, SURVEY.md §2.7).

        ``nmap`` > 1 folds that many SPOT_BATCH-sized batches into ONE device
        dispatch via ``lax.map`` (input gains a leading nmap axis): through
        the tunnel every RPC costs ~30-40 ms fixed, so dispatching per batch
        taxes a window by #batches round trips; the map keeps the per-step
        compute shape identical (batch >= 4 faults the axon worker — the map
        sidesteps that by sequencing inside the program)."""
        key = (orig_hw, target_hw, nmap)
        fn = self._raw_spot_fns.get(key)
        if fn is None:
            from ..data.preprocess import device_preprocess

            mean = self.cfg.MODEL.PIXEL_MEAN
            std = self.cfg.MODEL.PIXEL_STD
            fmt = self.cfg.INPUT.FORMAT

            yuv = self.upload_format == "yuv420" and orig_hw[0] % 2 == 0 \
                and orig_hw[1] % 2 == 0

            def raw_fn(p, raw_u8, thresh):
                if yuv:
                    from ..data.preprocess import decode_i420

                    raw_u8 = decode_i420(raw_u8)
                imgs = device_preprocess(raw_u8, target_hw, mean, std, fmt)
                out = self.model.apply(
                    p, imgs, None, thresh, method=GoMatchingModel.spot_and_detect
                )
                # pack every per-slot output into ONE (B, nq, K) f32 array so a
                # batch fetches in a single host round trip — per-array fetches
                # cost ~24 ms each through the tunnel (8 arrays x 12 batches
                # was ~2.3 s of the detector wall time)
                B = raw_u8.shape[0]
                nq = out["scores"].shape[1]
                parts = [
                    out["scores"][..., None].astype(jnp.float32),
                    out["valid"][..., None].astype(jnp.float32),
                    out["boxes"].astype(jnp.float32),
                    out["ctrl_points"].reshape(B, nq, -1).astype(jnp.float32),
                    out["recs"].astype(jnp.float32),  # ids < 2^24: exact
                    out["bd"].reshape(B, nq, -1).astype(jnp.float32),
                    out["reid"].astype(jnp.float32),
                ]
                return jnp.concatenate(parts, axis=-1)

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch_s = NamedSharding(self.mesh, P("data"))
                repl = NamedSharding(self.mesh, P())
                fn = jax.jit(
                    raw_fn, in_shardings=(None, batch_s, repl), out_shardings=batch_s
                )
            elif nmap > 1:
                def mapped_fn(p, raw_stack, thresh):
                    out = jax.lax.map(lambda r: raw_fn(p, r, thresh), raw_stack)
                    return out.reshape((-1,) + out.shape[2:])

                fn = jax.jit(mapped_fn)
            else:
                fn = jax.jit(raw_fn)
            self._raw_spot_fns[key] = fn
        return fn

    def _iter_window_chunks(self, batch: np.ndarray):
        """Encode one window's SPOT_BATCH*SPOT_SUPER super-chunks lazily.
        Yields (wire ndarray, nm, keep) where ``keep`` counts real (un-padded)
        frames in the super-chunk."""
        n = len(batch)
        bs = self.spot_batch
        sup = self.spot_super if self.mesh is None else 1
        step = bs * sup
        # the first super-chunk is a single batch: compute starts after one
        # batch's upload instead of `sup` batches' worth (the ~35 MB/s tunnel
        # makes the upload ramp the pipeline's exposed prefix)
        bounds = list(range(bs if sup > 1 and n > bs else step, n, step))
        for s, e in zip([0] + bounds, bounds + [n]):
            chunk = batch[s:e]
            keep = len(chunk)
            pad = (-keep) % bs
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.uint8)]
                )
            nm = len(chunk) // bs
            wire = self.encode_frames(chunk)
            if nm > 1:
                wire = wire.reshape((nm, bs) + wire.shape[1:])
            yield wire, nm, keep

    def _upload_window(self, batch: np.ndarray):
        """Encode + device_put one window's super-chunks WITHOUT dispatching
        compute. Returns [(device wire, nm, keep)]. device_put returns as soon
        as the transfer is enqueued, so a caller can overlap the wire time
        with the previous window's compute + tracking (TPU.PIPELINE_WINDOWS)."""
        return [
            (jax.device_put(wire), nm, keep)
            for wire, nm, keep in self._iter_window_chunks(batch)
        ]

    def _dispatch_uploaded(self, uploaded, orig_hw, target_hw, th):
        """Dispatch the spot program over pre-uploaded super-chunks."""
        bs = self.spot_batch
        pending = []
        for dev, nm, keep in uploaded:
            out = self._raw_spot_fn(orig_hw, target_hw, nm)(self.params, dev, th)
            pending.append((out, nm * bs, keep))
        return pending

    def _dispatch_window(self, batch: np.ndarray, orig_hw, target_hw, th,
                         uploaded=None):
        """Upload + dispatch one window of frames. Returns
        [(device_output (rows, nq, K), rows, keep)] per super-chunk.

        Without pre-uploaded chunks, upload and dispatch INTERLEAVE per chunk
        (encode c1 / wire c1 / compute c0 overlap — the strict-mode ramp the
        single-batch first chunk exists for)."""
        bs = self.spot_batch
        if uploaded is not None:
            return self._dispatch_uploaded(uploaded, orig_hw, target_hw, th)
        pending = []
        for wire, nm, keep in self._iter_window_chunks(batch):
            dev = jax.device_put(wire)
            out = self._raw_spot_fn(orig_hw, target_hw, nm)(self.params, dev, th)
            pending.append((out, nm * bs, keep))
        return pending

    def encode_frames(self, chunk_u8: np.ndarray) -> np.ndarray:
        """uint8 BGR frames -> the wire format ``_raw_spot_fn`` expects
        (planar I420 when TPU.UPLOAD_FORMAT=yuv420 and dims are even)."""
        if (
            self.upload_format == "yuv420"
            and chunk_u8.shape[1] % 2 == 0
            and chunk_u8.shape[2] % 2 == 0
        ):
            from ..data.preprocess import encode_i420

            return encode_i420(chunk_u8)
        return chunk_u8

    def _concat_fn(self, n: int):
        """Jitted n-way batch-axis concat (single-fetch window outputs)."""
        fn = self._concat_fns.get(n)
        if fn is None:
            fn = jax.jit(lambda *xs: jnp.concatenate(xs, 0) if len(xs) > 1 else xs[0])
            self._concat_fns[n] = fn
        return fn

    def _meta_fn(self, n_meta: int):
        """Jitted metadata-column slice of the packed (N, nq, K) output."""
        fn = self._concat_fns.get(("meta", n_meta))
        if fn is None:
            fn = jax.jit(lambda x: x[:, :, :n_meta])
            self._concat_fns[("meta", n_meta)] = fn
        return fn

    def _meta_topk_fn(self, n_meta: int, k: int):
        """Jitted compacting meta fetch: (N, nq, K) -> (N, k, n_meta + 2).

        Per frame, the k slots sorted valid-first (stable in slot order) with
        two extra columns: the row's ORIGINAL slot id and the frame's total
        valid count (for the exact-overflow fallback). Typically ~20 of
        nq=100 slots survive the threshold, so this ships ~nq/k x fewer bytes
        over the ~35 MB/s tunnel than the full meta fetch; values for every
        fetched row are bit-identical (pure take_along_axis)."""
        fn = self._concat_fns.get(("meta_topk", n_meta, k))
        if fn is None:

            def topk(x):
                meta = x[:, :, :n_meta]
                nq = meta.shape[1]
                valid = meta[:, :, 1] > 0.5  # packed column 1 = validity
                key = jnp.where(valid, 0, nq).astype(jnp.int32) + jnp.arange(
                    nq, dtype=jnp.int32
                )[None, :]
                order = jnp.argsort(key, axis=1)[:, :k]
                sel = jnp.take_along_axis(meta, order[:, :, None], axis=1)
                nvalid = valid.sum(axis=1).astype(jnp.float32)
                return jnp.concatenate(
                    [
                        sel,
                        order.astype(jnp.float32)[:, :, None],
                        jnp.broadcast_to(
                            nvalid[:, None, None], sel.shape[:2] + (1,)
                        ),
                    ],
                    axis=-1,
                )

            fn = jax.jit(topk)
            self._concat_fns[("meta_topk", n_meta, k)] = fn
        return fn

    def _fetch_meta(self, cat, n_meta: int) -> np.ndarray:
        """Fetch the window's (N, nq, n_meta) metadata, via the compacting
        top-K path (TPU.META_TOPK) when enabled; exact either way."""
        nq = int(cat.shape[1])
        k = self.meta_topk
        if not k or k >= nq or self.mesh is not None:
            return np.asarray(self._meta_fn(n_meta)(cat))
        m = np.asarray(self._meta_topk_fn(n_meta, k)(cat))
        if (m[:, 0, -1] > k).any():  # a frame overflowed K valid slots
            return np.asarray(self._meta_fn(n_meta)(cat))
        meta = np.zeros((m.shape[0], nq, n_meta), np.float32)
        slots = m[:, :, -2].astype(np.int64)
        rr = np.repeat(np.arange(m.shape[0]), k)
        meta[rr, slots.reshape(-1)] = m[:, :, :n_meta].reshape(-1, n_meta)
        return meta

    def _gather_reid_fn(self, n_meta: int):
        """Jitted valid-slot reid gather: (N, nq, K), (Mb, 2) -> (Mb, F)."""
        fn = self._concat_fns.get(("reid", n_meta))
        if fn is None:
            fn = jax.jit(lambda x, idx: x[idx[:, 0], idx[:, 1], n_meta:])
            self._concat_fns[("reid", n_meta)] = fn
        return fn

    def unpack_spot(self, flat: np.ndarray) -> Dict[str, np.ndarray]:
        """Inverse of the raw-spot packing: (B, nq, K) f32 -> output dict."""
        npts = self.cfg.MODEL.TRANSFORMER.NUM_POINTS
        B, nq, _ = flat.shape
        i = 0

        def take(n):
            nonlocal i
            part = flat[..., i : i + n]
            i += n
            return part

        out = {
            "scores": take(1)[..., 0],
            "valid": take(1)[..., 0] > 0.5,
            "boxes": take(4),
            "ctrl_points": take(2 * npts),
            "recs": take(npts).astype(np.int32),
            "bd": take(4 * npts).reshape(B, nq, npts, 4),
        }
        out["reid"] = flat[..., i:]
        return out

    # ------------------------------------------------------------------
    def spot_frames(self, frames: List[np.ndarray], time_cost: Optional[Dict] = None,
                    uploaded=None, pending=None):
        """BGR frames (one resolution) -> list of FrameDetections (untracked).

        ``uploaded``/``pending``: pipelined callers (process_video with
        TPU.PIPELINE_WINDOWS) pass this window's pre-uploaded wire chunks or
        already-dispatched outputs; the math is identical either way."""
        from ..data.preprocess import compute_test_size

        tc = time_cost if time_cost is not None else {}
        t0 = time.time()
        orig_hw = frames[0].shape[:2]
        in_h, in_w = compute_test_size(
            orig_hw[0], orig_hw[1],
            self.cfg.INPUT.MIN_SIZE_TEST, self.cfg.INPUT.MAX_SIZE_TEST,
        )
        if uploaded is None and pending is None:
            batch = np.stack([np.ascontiguousarray(f) for f in frames])  # (N, H, W, 3) u8
        tc["pre_process"] = tc.get("pre_process", 0) + time.time() - t0

        dets: List[FrameDetections] = []
        t0 = time.time()
        # issue every host->device transfer + dispatch up front (uploads and
        # compute pipeline behind one another through the tunnel), then fetch
        # the whole window's packed outputs in ONE round trip: per-RPC fixed
        # cost is ~30-40 ms, so both the per-batch dispatches (folded nmap-to-1
        # by the lax.map spot variant) and the per-batch fetches (folded by the
        # on-device concat) taxed a window by ~0.5 s before this
        th = jnp.float32(self.score_thresh)
        if pending is None:
            pending = self._dispatch_window(
                batch if uploaded is None else None, orig_hw, (in_h, in_w), th,
                uploaded=uploaded,
            )
        cat = self._concat_fn(len(pending))(*[f for f, _, _ in pending])
        # two-phase fetch: the packed output is dominated by the 1024-dim reid
        # embeddings (~1 KB/slot at 100 slots/frame), but only ~20 slots/frame
        # survive the threshold — fetch the small metadata columns for every
        # slot, then gather ONLY the valid slots' reid rows on device. Saves
        # ~10 MB (~0.3 s at the tunnel's ~35 MB/s) per 24-frame window, with
        # bit-identical f32 reid values.
        n_meta = 6 + 7 * self.cfg.MODEL.TRANSFORMER.NUM_POINTS
        meta = self._fetch_meta(cat, n_meta)
        frame_rows = []
        row = 0
        for _, rows, keep in pending:
            frame_rows.extend(range(row, row + keep))
            row += rows
        outs = self.unpack_spot(meta[frame_rows])  # reid comes back (N, nq, 0)
        valid_all = outs["valid"]
        pairs = np.argwhere(valid_all)  # (M, 2): (frame order, slot)
        M = len(pairs)
        pool_new = None
        if self.assoc_indexed:
            # gather the valid slots' reid rows ON DEVICE and keep them there
            # as the association pool (no host fetch; dispatch is async)
            bucket = 1 << max(4, int(np.ceil(np.log2(max(M, 1)))))
            idx = np.zeros((bucket, 2), np.int32)
            if M:
                idx[:M, 0] = np.asarray(frame_rows, np.int32)[pairs[:, 0]]
                idx[:M, 1] = pairs[:, 1]
            pool_new = self._gather_reid_fn(n_meta)(cat, jnp.asarray(idx))
        elif M:
            bucket = 1 << max(4, int(np.ceil(np.log2(M))))
            idx = np.zeros((bucket, 2), np.int32)
            idx[:M, 0] = np.asarray(frame_rows, np.int32)[pairs[:, 0]]
            idx[:M, 1] = pairs[:, 1]
            reid_rows = np.asarray(
                self._gather_reid_fn(n_meta)(cat, jnp.asarray(idx))
            )[:M]
        tc["detector"] = tc.get("detector", 0) + time.time() - t0

        off = 0
        for i in range(len(frame_rows)):
            valid = valid_all[i]
            k = int(valid.sum())
            if self.assoc_indexed:
                reid = None
                rows = np.arange(off, off + k, dtype=np.int64)
            else:
                reid = reid_rows[off : off + k] if M else np.zeros(
                    (0, int(cat.shape[2]) - n_meta), np.float32
                )
                rows = None
            off += k
            dets.append(
                FrameDetections(
                    boxes=outs["boxes"][i][valid],
                    scores=outs["scores"][i][valid],
                    ctrl_points=outs["ctrl_points"][i][valid],
                    recs=outs["recs"][i][valid],
                    bd=outs["bd"][i][valid],
                    reid=reid,
                    image_hw=(in_h, in_w),
                    pool_rows=rows,
                )
            )
        if self.assoc_indexed:
            self._adopt_pool(pool_new, dets)
        self._orig_hw = orig_hw
        return dets

    def _adopt_pool(self, pool_new, dets):
        """Swap the device reid pool to the new window's. Tracker frames still
        inside the association window (the previous window's tail — short pairs
        span 1 frame back, long windows up to TEST_LEN) get their rows
        re-gathered into the head of the new pool so cross-window matcher
        requests stay resolvable after the old pool is dropped. All device ops
        are tiny async dispatches (no sync)."""
        tail = [
            f
            for f in self.tracker.frames[-self.tracker.test_len :]
            if f.pool_rows is not None and len(f)
        ]
        if self._pool is None or not tail:
            self._pool = pool_new
            return
        rows_old = np.concatenate([f.pool_rows for f in tail]).astype(np.int32)
        K = len(rows_old)
        kpad = 1 << max(4, int(np.ceil(np.log2(max(K, 1)))))
        idx = np.zeros((kpad,), np.int32)
        idx[:K] = rows_old
        take = self._concat_fns.get("pool_take")
        if take is None:
            take = jax.jit(lambda pool, i: jnp.take(pool, i, axis=0))
            self._concat_fns["pool_take"] = take
        cat0 = self._concat_fns.get("pool_cat")
        if cat0 is None:
            cat0 = jax.jit(lambda a, b: jnp.concatenate([a, b], axis=0))
            self._concat_fns["pool_cat"] = cat0
        tail_pool = take(self._pool, jnp.asarray(idx))
        self._pool = cat0(tail_pool, pool_new)
        off = 0
        for f in tail:
            f.pool_rows = np.arange(off, off + len(f), dtype=np.int64)
            off += len(f)
        for d in dets:
            d.pool_rows = d.pool_rows + kpad

    def process_video(self, frames, time_cost: Optional[Dict] = None,
                      window: int = 100):
        """Full pipeline for one video -> list of tracked FrameDetections scaled to
        the original resolution.

        ``frames`` may be any iterable of BGR arrays — a lazy decoder generator
        keeps host memory bounded for arbitrarily long videos. Frames are
        processed in <= ``window``-frame spot-then-track phases (the reference's
        100-frame batching, eval.py:329): per window, spotting completes before
        tracking starts (the tracker's tiny device calls would otherwise
        serialize behind every queued spot batch on the in-order execution
        stream and sync per frame — measured ~10% slower), raw frames are
        dropped after dispatch, and the tracker's reid memory is freed outside
        its TEST_LEN sliding window — so peak memory is O(window), not O(video).
        """
        tc = time_cost if time_cost is not None else {}
        self.tracker.reset()
        self._pool = None
        # cross-window pipelining (TPU.PIPELINE_WINDOWS): 0 = strict
        # spot-then-track sequencing; 1 = the NEXT window's encode +
        # device_put are issued before the current window's fetch/track, so
        # the wire time (the tunnel's ~35 MB/s is the e2e bottleneck) hides
        # behind compute + tracking; 2 = additionally dispatch the next
        # window's compute ahead, keeping the device busy through the
        # tracking phase (the tracker's batched association calls then queue
        # behind that compute — throughput-optimal when tracking is
        # host-bound, but it delays their results; measure per deployment).
        pipeline = int(getattr(self.cfg.TPU, "PIPELINE_WINDOWS", 1))
        from ..data.preprocess import compute_test_size

        def flush(buf, uploaded=None, pending=None):
            dets = self.spot_frames(buf, tc, uploaded=uploaded, pending=pending)
            t0 = time.time()
            # one batched device call covers every adjacent pair's short-term
            # matcher pass (incl. the pair spanning the previous window); its
            # wall time belongs to the short_match stage bucket
            prevs = ([self.tracker.frames[-1]] if self.tracker.frames else []) + dets[:-1]
            cache = self.tracker.precompute_short_asso(list(zip(prevs, dets[len(dets) - len(prevs):])))
            self.tracker.time_cost["short_match"] += time.time() - t0
            t0 = time.time()
            # speculative batched window re-matches (exact-key cache; misses
            # fall back to per-frame calls inside step)
            self.tracker.precompute_long_asso(dets, cache)
            self.tracker.time_cost["long_match"] += time.time() - t0
            t0 = time.time()
            for det in dets:
                self.tracker.step(det, short_asso_cache=cache)
            tc["tracker"] = tc.get("tracker", 0) + time.time() - t0

        def gen_windows():
            buf: List[np.ndarray] = []
            for frame in frames:
                buf.append(frame)
                if len(buf) >= window:
                    yield buf
                    buf = []
            if buf:
                yield buf

        prev = None  # (frames, uploaded, pending) of the yet-untracked window
        for buf in gen_windows():
            up = pend = None
            # Pre-upload ONLY when a previous window is pending: overlapping
            # window N+1's encode+wire with window N's fetch/track is the
            # whole point, and for the FIRST window eager upload is a strict
            # loss — it serializes encode->dispatch where spot_frames'
            # interleaved path hides each chunk's host encode behind the
            # previous chunk's device compute (measured ~0.5 s/24f slower).
            if pipeline >= 1 and prev is not None:
                # enqueue this window's wire bytes (and optionally compute)
                # BEFORE fetching/tracking the previous window; its host-side
                # cost is wire/upload work that belongs to the detector bucket
                t0 = time.time()
                batch = np.stack([np.ascontiguousarray(f) for f in buf])
                up = self._upload_window(batch)
                if pipeline >= 2:
                    orig_hw = buf[0].shape[:2]
                    thw = compute_test_size(
                        orig_hw[0], orig_hw[1],
                        self.cfg.INPUT.MIN_SIZE_TEST, self.cfg.INPUT.MAX_SIZE_TEST,
                    )
                    pend = self._dispatch_uploaded(
                        up, orig_hw, thw, jnp.float32(self.score_thresh)
                    )
                    up = None
                tc["detector"] = tc.get("detector", 0) + time.time() - t0
            if prev is not None:
                flush(*prev)
            prev = (buf, up, pend)
        if prev is not None:
            flush(*prev)

        for k, v in self.tracker.time_cost.items():
            tc[k] = tc.get(k, 0) + v

        t0 = time.time()
        tracked = self.tracker.remove_short_tracks()
        orig_h, orig_w = self._orig_hw
        for f in tracked:
            sy = orig_h / f.image_hw[0]
            sx = orig_w / f.image_hw[1]
            f.ctrl_points = f.ctrl_points.copy()
            f.ctrl_points[:, 0::2] *= sx
            f.ctrl_points[:, 1::2] *= sy
            f.bd = f.bd.copy()
            f.bd[..., 0::2] *= sx
            f.bd[..., 1::2] *= sy
        tc["post_process"] = tc.get("post_process", 0) + time.time() - t0
        return tracked

    def decode_text(self, rec) -> str:
        return ctc_decode(rec, self.voc_size, self.char_table)
