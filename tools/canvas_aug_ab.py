"""Train the proof config with the OLD canvas-frame augmentation bug
re-enabled, for the round-3 claim re-measurement on the calibrated
40-image val set (VERDICT round-3 item 3).

Session L found augmentation was running on the zero-padded batch canvas
(transform origin = canvas size, contrast mean included padding, warp
replicated the canvas edge) and fixed it by passing each example's true
resized (h, w) into `augment_example` (data/pipeline.py:126-133). The
headline claim — val mAP 0.4027 (fixed) vs 0.1975 (canvas) — was measured
on the 8-image val that PERFORMANCE.md's own calibration says carries
±0.1 mAP seed noise. This driver retrains the IDENTICAL proof config with
`image_hw=None` monkeypatched back in (augment.py:341-356 documents that
None means "treat the whole canvas as the image"), so both arms can be
scored on the trustworthy 40-image set.

Usage (on the chip, one process):
  tools/tpu_run.sh python tools/canvas_aug_ab.py <out_dir> [epochs]
Then evaluate both models on /tmp/full_res_kitti40 and compare.
"""

import sys

import ground_plane_polling_tpu.data.pipeline as pipeline

_true_frame_augment = pipeline.augment_example


def _canvas_frame_augment(key, image, annotations, ignore_boxes,
                          config, image_hw=None):
    # image_hw=None -> augment_example uses the full canvas extent,
    # which is exactly the pre-session-L behavior being reproduced.
    return _true_frame_augment(key, image, annotations, ignore_boxes,
                               config=config, image_hw=None)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/full_res_canvas_aug"
    epochs = sys.argv[2] if len(sys.argv) > 2 else "30"

    # Patch BEFORE any training trace: prepare_batch resolves the module
    # global at trace time (pipeline.py:132).
    pipeline.augment_example = _canvas_frame_augment

    from ground_plane_polling_tpu.bin.train import main as train_main

    # Identical to tools/tpu_session_d.sh's proof config except the patch.
    train_main([
        "--backbone", "resnet50", "--batch-size", "2",
        "--epochs", epochs, "--steps", "60",
        "--lr", "1e-4", "--bf16", "--random-transform", "--no-evaluation",
        "--snapshot", "auto", "--snapshot-every", "10",
        "--snapshot-path", f"{out}/snapshots",
        "--log-path", f"{out}/log.jsonl",
        "kitti", "/tmp/full_res_kitti",
    ])


if __name__ == "__main__":
    main()
