#!/usr/bin/env python
"""Production-geometry golden spotter check ON THE REAL TPU (VERDICT r4 #5).

The CPU suite pins fp32 parity of the converted spotter at the bench's exact
stride-8 extents (125x223, tests/test_golden_spotter_midres.py::
test_spotter_fullres_fp32_parity) — but only through the gather/'xla' core
and the interpret-mode kernels. The round-4 Mosaic window-alignment crashes
(4788db8) were TPU-LOWERING bugs invisible off-device, so this tool closes
the last gap: dump the torch reference (ms_deform_attn.py:40-60 numerics) at
125x223, convert, and run the PRODUCTION fused VMEM samplers on the TPU —
f32 for exactness vs the golden, then bf16 for the production-precision
drift bound.

Usage:  python tools/check_fullres_golden_tpu.py [--base-hw 125 223]
        [--golden /tmp/spotter_fullres.npz]   (reuses the dump if present)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests", "golden"))
sys.path.insert(0, os.path.join(ROOT, "tools"))

OUT_KEYS = [
    "pred_logits",
    "pred_text_logits",
    "pred_ctrl_points",
    "pred_bd_points",
    "query_features",
]


def build_spotter(cfg, sampling_impl):
    from gomatching_tpu.models.spotter import DeepSoloSpotter

    t = cfg.MODEL.TRANSFORMER
    return DeepSoloSpotter(
        d_model=t.HIDDEN_DIM,
        n_heads=t.NHEADS,
        num_encoder_layers=t.ENC_LAYERS,
        num_decoder_layers=t.DEC_LAYERS,
        dim_feedforward=t.DIM_FEEDFORWARD,
        num_queries=t.NUM_QUERIES,
        num_points=t.NUM_POINTS,
        voc_size=t.VOC_SIZE,
        sampling_impl=sampling_impl,
        tiled_halo=cfg.TPU.TILED_HALO,
    )


def inputs_from_golden(golden, dtype=np.float32):
    import jax.numpy as jnp

    from gomatching_tpu.models.pos_encoding import position_encoding_2d

    feats = [
        jnp.asarray(np.transpose(golden[f"sq.feat{i}"], (0, 2, 3, 1)).astype(dtype))
        for i in range(3)
    ]
    pos = [
        position_encoding_2d((f.shape[0], f.shape[1], f.shape[2]), 128, 10000.0, None)
        for f in feats
    ]
    if dtype != np.float32:
        pos = [p.astype(dtype) for p in pos]
    return feats, pos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-hw", type=int, nargs=2, default=(125, 223),
                    help="stride-8 level extents (125x223 = the bench's "
                    "1000x1778 ICDAR15 eval geometry)")
    ap.add_argument("--golden", default="/tmp/spotter_fullres.npz")
    args = ap.parse_args()

    if not os.path.exists(args.golden):
        print(f"# dumping torch reference at stride-8 {args.base_hw} "
              "(CPU, takes minutes)...", flush=True)
        import make_golden_spotter_midres

        t0 = time.time()
        make_golden_spotter_midres.main(args.golden, base_hw=tuple(args.base_hw))
        print(f"# dump done in {time.time() - t0:.0f}s -> {args.golden}", flush=True)
    golden = np.load(args.golden)

    from convert_torch_weights import convert
    from make_golden_spotter_midres import prod_cfg

    cfg = prod_cfg()
    sd = {k[len("sd."):]: golden[k] for k in golden.files if k.startswith("sd.")}
    tree, missing, _ = convert(sd, cfg)
    assert not [k for k in missing if k.startswith("detection_transformer.")]
    params = {"params": tree["params"]["detection_transformer"]}

    import jax
    import jax.numpy as jnp

    print(f"# device: {jax.devices()[0].platform}", flush=True)
    feats, pos = inputs_from_golden(golden)

    # ---- f32 vmem: must be exact-within-tolerance vs the torch golden
    spotter = build_spotter(cfg, "vmem")
    fn = jax.jit(lambda p, f, q: spotter.apply(p, f, q, None))
    t0 = time.time()
    out = {k: np.asarray(v) for k, v in fn(params, feats, pos).items()
           if k in OUT_KEYS}
    print(f"# vmem f32 forward (incl. compile): {time.time() - t0:.0f}s", flush=True)
    ok = True
    for k in OUT_KEYS:
        want, got = golden[f"sq.out.{k}"], out[k]
        err = np.abs(got - want).max()
        tol = 1e-3 + 1e-3 * np.abs(want).max()
        status = "OK " if err <= tol else "FAIL"
        ok &= err <= tol
        print(f"#   {status} {k}: max|err|={err:.2e} (tol~{tol:.1e})", flush=True)

    # ---- bf16 vmem: production precision, report conditional drift like the
    # CPU midres test (same-proposal queries only; random-weight top-k flips
    # are meaningless, tests/test_golden_spotter_midres.py:150-158)
    params_bf = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    feats_bf = [f.astype(jnp.bfloat16) for f in feats]
    pos_bf = [p.astype(jnp.bfloat16) for p in pos]
    fn_bf = jax.jit(lambda p, f, q: spotter.apply(p, f, q, None))
    t0 = time.time()
    out_bf = {k: np.asarray(v, np.float32)
              for k, v in fn_bf(params_bf, feats_bf, pos_bf).items() if k in OUT_KEYS}
    print(f"# vmem bf16 forward (incl. compile): {time.time() - t0:.0f}s", flush=True)
    ref_pts = golden["sq.out.pred_ctrl_points"]
    per_q = np.abs(out_bf["pred_ctrl_points"] - ref_pts).max(axis=(2, 3))[0]
    same = per_q < 0.05
    ref_scores = 1 / (1 + np.exp(-golden["sq.out.pred_logits"].mean(2)[..., 0]))[0]
    got_scores = 1 / (1 + np.exp(-out_bf["pred_logits"].mean(2)[..., 0]))[0]
    ds = np.abs(got_scores - ref_scores)[same]
    print(f"# bf16 drift at production geometry: same-proposal "
          f"fraction={same.mean():.2f}; score max={ds.max():.4f} "
          f"mean={ds.mean():.5f}; ctrl max={per_q[same].max():.5f} "
          f"(= {per_q[same].max() * 1778:.2f}px at 1778w)", flush=True)

    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
