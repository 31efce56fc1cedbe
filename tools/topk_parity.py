"""pre_nms_top_k parity sweep (VERDICT round-1 item 7).

Evaluates a trained model on the val split at pre_nms_top_k in
{256, 512, 1024, 4096} (4096 ~ "uncapped" at this anchor count once the
0.05 score threshold applies) and reports mAP + error deltas — the
evidence for choosing the default cap. Run on the real chip after
tools/train_full_res_proof.sh has produced /tmp/full_res_proof/model.npz.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax.numpy as jnp
import numpy as np


def main():
    model_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/full_res_proof/model.npz"
    kitti_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/full_res_kitti"

    from ground_plane_polling_tpu.data.kitti import KittiDataset
    from ground_plane_polling_tpu.data.pipeline import KittiLoader
    from ground_plane_polling_tpu.models import build_detector
    from ground_plane_polling_tpu.training.checkpoint import import_params
    from ground_plane_polling_tpu.training.loop import evaluate_model
    from ground_plane_polling_tpu.training.train import TrainState

    ds = KittiDataset(kitti_root, "val")
    loader = KittiLoader(ds, batch_size=1, shuffle=False)
    model = build_detector("resnet50", num_classes=ds.num_classes,
                           dtype=jnp.bfloat16)
    variables = import_params(model_path)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       frozen=variables.get("frozen", {}),
                       opt_state=None, lr=jnp.zeros(()))

    for top_k in (256, 512, 1024, 4096):
        mean_ap, errors, aps = evaluate_model(
            model, state, loader, num_classes=ds.num_classes,
            pre_nms_top_k=top_k)
        print(f"top_k={top_k:5d}: mAP={mean_ap:.4f} "
              f"kp_err={errors['keypoint_error']:.3f} "
              f"h={errors['height_error']:.4f} "
              f"buckets={{{', '.join(f'{k}:{v[0]:.3f}/{int(v[1])}' for k, v in sorted(aps.items()) if v[1] > 0)}}}",
              flush=True)


if __name__ == "__main__":
    main()
