#!/usr/bin/env python
"""nerve-enhance — end-to-end video enhancement CLI (the serving entry point).

The reference exposes whole-video enhancement only as a Python API
(nerve_cl/models/enhancement_engine.py:186-248 ``enhance_video``); there is no
serving entry point in the repo — its four CLIs all *train*. This completes
the user workflow: train with ``nerve-train``, serve with ``nerve-enhance``.

Input formats (auto-detected by extension):
  * ``.npy``  — array of shape (T, C, H, W) or (T, H, W, C), uint8 or float
  * ``.npz``  — same array under key ``video`` (optional ``masks``)
  * ``.pt``   — torch tensor or ``{'video': tensor}`` dict (CPU torch)

Weights:
  * ``--torch-checkpoint`` — a nerve_cl ``EnhancementEngine`` state_dict
    (.pth), imported via nerve_tpu.models.import_torch.
  * ``--sr-checkpoint``    — an orbax directory written by ``nerve-train``;
    its SuperResolutionNet params are grafted into the engine's
    ``super_resolution`` subtree.
  * neither — fresh init (useful for smoke tests / latency measurement).

Output: ``.npy`` video, uint8 by default (``--float`` for float32), plus one
JSON summary line on stdout (frames, shapes, wall seconds, fps).
"""

from __future__ import annotations

# Direct-script execution (`python experiments/<name>.py`) puts experiments/
# on sys.path but not the repo root; make `import nerve_tpu` work without an
# editable install. No-op when imported as the experiments.* package or when
# the console script (pip-installed) runs.
if __package__ in (None, ""):
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import os
import sys
import time

import numpy as np


def load_video(path: str):
    """Returns (video, masks_or_None) as numpy arrays, layout (T, C, H, W)."""
    ext = os.path.splitext(path)[1].lower()
    masks = None
    if ext == ".npy":
        video = np.load(path)
    elif ext == ".npz":
        blob = np.load(path)
        video = blob["video"]
        masks = blob["masks"] if "masks" in blob.files else None
    elif ext in (".pt", ".pth"):
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(blob, dict):
            video = blob["video"].numpy()
            masks = blob["masks"].numpy() if "masks" in blob else None
        else:
            video = blob.numpy()
    else:
        raise SystemExit(f"unsupported input format: {ext}")
    if video.ndim != 4:
        raise SystemExit(f"expected a 4-D video, got shape {video.shape}")
    # Channel-last → channel-first (the facade's reference layout).
    if video.shape[-1] in (1, 3) and video.shape[1] not in (1, 3):
        video = np.moveaxis(video, -1, 1)
    if masks is not None and masks.shape[-1] == 1 and masks.shape[1] != 1:
        masks = np.moveaxis(masks, -1, 1)
    return video, masks


def build_engine(args):
    from nerve_tpu.models import api
    from nerve_tpu.models.enhancement_engine import EngineConfig

    cfg = EngineConfig(
        scale_factor=args.scale,
        sr_num_features=args.sr_features,
        sr_num_residual_blocks=args.sr_blocks,
        sr_temporal_window=args.sr_window,
        recovery_temporal_window=args.recovery_window,
    ).with_mode(args.mode)
    if args.adaptive:
        engine = api.AdaptiveEnhancementEngine(cfg, seed=args.seed)
    else:
        engine = api.EnhancementEngine(cfg, seed=args.seed)

    if args.torch_checkpoint:
        import torch

        from nerve_tpu.models import import_torch

        sd = torch.load(args.torch_checkpoint, map_location="cpu",
                        weights_only=False)
        if isinstance(sd, dict) and "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        importer = (import_torch.import_adaptive_engine if args.adaptive
                    else import_torch.import_enhancement_engine)
        variables = importer(sd, engine.config)
        import_torch.validate_against(variables, engine.variables)
        engine.variables = variables
    elif args.sr_checkpoint:
        import jax

        from nerve_tpu.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.sr_checkpoint)
        restored = mgr.restore_raw()
        mgr.close()
        params = engine.variables["params"]
        tgt = params["engine"] if "engine" in params else params
        want = jax.tree_util.tree_map(
            lambda x: (x.shape, str(x.dtype)), tgt["super_resolution"]
        )
        got = jax.tree_util.tree_map(
            lambda x: (x.shape, str(x.dtype)), restored["params"]
        )
        if want != got:
            raise SystemExit(
                "--sr-checkpoint params don't match the engine's SR subtree; "
                "pass the --scale/--sr-features/--sr-blocks/--sr-window the "
                "checkpoint was trained with (nerve-train defaults: "
                "--sr-features 32 --sr-blocks 4)."
            )
        tgt["super_resolution"] = restored["params"]
        if restored.get("batch_stats"):
            bs = engine.variables.setdefault("batch_stats", {})
            bs_tgt = bs.setdefault("engine", {}) if "engine" in params else bs
            bs_tgt["super_resolution"] = restored["batch_stats"]
    return engine


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("input", help="video file (.npy/.npz/.pt)")
    p.add_argument("-o", "--output", default="enhanced.npy")
    p.add_argument("--mode", default="full",
                   choices=["full", "sr_only", "recovery_only", "lightweight"])
    p.add_argument("--scale", type=int, default=2)
    p.add_argument("--sr-features", type=int, default=64)
    p.add_argument("--sr-blocks", type=int, default=8)
    p.add_argument("--sr-window", type=int, default=1)
    p.add_argument("--recovery-window", type=int, default=2)
    p.add_argument("--strength", type=float, default=None,
                   help="override the learned enhancement strength")
    p.add_argument("--masks", default=None,
                   help=".npy corruption masks (T, 1, H, W); overrides any "
                        "masks bundled in the input file")
    p.add_argument("--adaptive", action="store_true",
                   help="use AdaptiveEnhancementEngine")
    p.add_argument("--budget", type=float, default=0.8,
                   help="resource budget for --adaptive (0..1)")
    p.add_argument("--user-pref", type=float, default=0.7,
                   help="user quality preference for --adaptive (0..1)")
    p.add_argument("--torch-checkpoint", default=None,
                   help="nerve_cl EnhancementEngine state_dict (.pth)")
    p.add_argument("--sr-checkpoint", default=None,
                   help="orbax directory from nerve-train (SR params)")
    p.add_argument("--float", action="store_true",
                   help="write float32 output instead of uint8")
    p.add_argument("--int8", default="off", choices=["off", "rdb", "full"],
                   help="int8 SR serving: 'rdb' quantises the RDB chain, "
                        "'full' every fused conv-chain site; activation "
                        "scales calibrate on the input video's first window")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    video, masks = load_video(args.input)
    if args.masks:
        masks = np.load(args.masks)
        if masks.shape[-1] == 1 and masks.shape[1] != 1:
            masks = np.moveaxis(masks, -1, 1)
    t, c, h, w = video.shape

    engine = build_engine(args)
    if args.adaptive:
        # The reference's adaptive engine picks the pipeline mode from the
        # resource budget (enhancement_engine.py:362-370) and inherits the
        # default-strength whole-video path (:295); mirror both here.
        from nerve_tpu.models.enhancement_engine import select_mode_for_budget

        mode = select_mode_for_budget(args.budget)
        if mode != args.mode:
            engine.set_enhancement_mode(mode)
            args.mode = mode
    if args.strength is not None:
        import jax.numpy as jnp

        params = engine.variables["params"]
        tgt = params["engine"] if "engine" in params else params
        tgt["enhancement_strength"] = jnp.asarray([args.strength], jnp.float32)

    if args.int8 != "off":
        if args.mode not in ("full", "sr_only"):
            print(f"# --int8 ignored: mode {args.mode!r} has no full SR net",
                  file=sys.stderr)
            # Serving stayed f32 — record that in the JSON summary too, so
            # downstream parsers never misread the served precision
            # (round-4 advisor finding).
            args.int8 = "off"
        else:
            engine.quantize_int8(video, chains=args.int8 == "full")

    import jax

    t0 = time.perf_counter()
    out = engine.enhance_video(
        video, corruption_masks=masks, as_uint8=not args.float
    )
    out = np.asarray(jax.block_until_ready(out))
    wall = time.perf_counter() - t0

    np.save(args.output, out)
    summary = {
        "frames": t,
        "input_shape": list(video.shape),
        "output_shape": list(out.shape),
        "output_dtype": str(out.dtype),
        "mode": args.mode,
        "int8": args.int8,
        "seconds": round(wall, 3),
        "fps_including_compile": round(t / wall, 2),
        "output": args.output,
        "backend": jax.default_backend(),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
