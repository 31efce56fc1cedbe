"""Convert a training checkpoint into a distributable inference artifact —
the reference's retinanet-3D-convert-model
(/root/reference/keras_retinanet_3D/bin/convert_model.py).

The reference bakes NMS/filter flags into a serialized graph; here the
artifact is an .npz of (params + frozen BN stats) plus a JSON sidecar with
the model/filter configuration that run_network uses to rebuild the jitted
pipeline.

  python -m ground_plane_polling_tpu.bin.convert_model \
      snapshots/step_00001234 model_out.npz --backbone resnet50 --no-nms
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="Export inference weights.")
    p.add_argument("checkpoint", help="Training checkpoint path (orbax dir), "
                                      "an .npz weight file, or a reference "
                                      "Keras .h5 checkpoint (imported via "
                                      "models.h5_import).")
    p.add_argument("model_out", help="Output path: .npz (native artifact) "
                                     "or .h5 (reference Keras layout, "
                                     "models.h5_export; resnet family).")
    p.add_argument("--backbone", default=None,
                   help="default: the input's .json sidecar if present, "
                        "else resnet50")
    p.add_argument("--num-classes", type=int, default=None,
                   help="default: inferred from the classification head "
                        "width of the loaded weights")
    # filter flags default to None so an input .npz sidecar's serving
    # config survives reconversion unless a flag is explicitly given
    p.add_argument("--nms", dest="nms", action="store_true", default=None)
    p.add_argument("--no-nms", dest="nms", action="store_false")
    p.add_argument("--class-specific-filter", action="store_true",
                   default=None)
    p.add_argument("--no-class-specific-filter", dest="class_specific_filter",
                   action="store_false")
    p.add_argument("--orientation-specific-filter", action="store_true",
                   default=None)
    p.add_argument("--no-orientation-specific-filter",
                   dest="orientation_specific_filter", action="store_false")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp

    from ..models import build_detector
    from ..training.checkpoint import (export_params, import_params,
                                       restore_checkpoint)
    from ..training.train import create_train_state, make_optimizer

    import os

    # the exported sidecar must describe the WEIGHTS, not CLI defaults:
    # prefer the input .npz's own sidecar for unspecified flags, and
    # infer num_classes from the head widths after loading (a resnet101
    # or 3-class model converted without repeating --backbone/
    # --num-classes used to get a sidecar claiming resnet50/1)
    in_cfg = {}
    if args.checkpoint.endswith(".npz") and os.path.exists(
            args.checkpoint + ".json"):
        with open(args.checkpoint + ".json") as f:
            in_cfg = json.load(f)
    backbone = args.backbone or in_cfg.get("backbone", "resnet50")

    if args.checkpoint.endswith((".h5", ".hdf5")):
        from ..models.h5_import import load_reference_h5
        variables = load_reference_h5(args.checkpoint, backbone=backbone)
    elif args.checkpoint.endswith(".npz"):
        variables = import_params(args.checkpoint)
    else:
        # orbax restore needs the model structure up front: num_classes
        # comes from the flag or the default; a mismatch fails loudly at
        # restore (structure mismatch), never silently
        model = build_detector(backbone,
                               num_classes=args.num_classes or 1)
        template_vars = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        template = create_train_state(template_vars, make_optimizer())
        state = restore_checkpoint(args.checkpoint, template)
        variables = {"params": state.params, "frozen": state.frozen}

    # num_classes from the loaded head widths (cls out = A*8*C, box = A*12)
    box_out_ch = variables["params"]["regression"]["box_out"][
        "bias"].shape[0]
    cls_out_ch = variables["params"]["classification"]["cls_out"][
        "bias"].shape[0]
    num_anchors = max(box_out_ch // 12, 1)
    inferred = (cls_out_ch // (num_anchors * 8)
                if cls_out_ch % (num_anchors * 8) == 0 else None)
    # precedence: explicit flag > weights-inferred > (stale?) input
    # sidecar — the weights are the truth, and a legacy sidecar carrying
    # the old wrong default must not outrank them
    num_classes = args.num_classes or inferred or \
        in_cfg.get("num_classes") or 1
    if inferred is not None and num_classes != inferred:
        raise ValueError(
            f"--num-classes {num_classes} contradicts the loaded weights "
            f"(classification head width {cls_out_ch} -> {inferred} "
            f"classes at {num_anchors} anchors)")

    if args.model_out.endswith((".h5", ".hdf5")):
        # reverse interop: write the reference's Keras checkpoint layout
        from ..models.h5_export import export_reference_h5

        export_reference_h5(variables, args.model_out,
                            backbone=backbone)
        print(f"wrote {args.model_out} (reference Keras h5 layout)")
        return

    export_params(args.model_out, variables)

    def _flag(name, value, default):
        # explicit CLI flag > input sidecar > canonical default
        if value is not None:
            return value
        return bool(in_cfg.get(name, default))

    config = {
        "backbone": backbone,
        "num_classes": num_classes,
        "nms": _flag("nms", args.nms, True),
        "class_specific_filter": _flag(
            "class_specific_filter", args.class_specific_filter, True),
        "orientation_specific_filter": _flag(
            "orientation_specific_filter",
            args.orientation_specific_filter, False),
    }
    with open(args.model_out + ".json", "w") as f:
        json.dump(config, f, indent=2)
    print(f"wrote {args.model_out} (+ .json config)")


if __name__ == "__main__":
    main()
