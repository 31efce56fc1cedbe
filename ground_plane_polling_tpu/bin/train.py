"""Training CLI — the reference's retinanet-3D-train for the kitti dataset
(/root/reference/keras_retinanet_3D/bin/train.py), TPU-native.

Example:
  python -m ground_plane_polling_tpu.bin.train kitti /data/kitti \
      --backbone resnet50 --batch-size 2 --epochs 50 --random-transform \
      --snapshot-path ./snapshots --data-parallel
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp


def parse_args(argv):
    p = argparse.ArgumentParser(description="Train a GPP detector on TPU.")
    sub = p.add_subparsers(dest="dataset_type")
    kitti = sub.add_parser("kitti")
    kitti.add_argument("kitti_path",
                       help="Path to the prepared dataset (train/val dirs).")

    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps", type=int, default=None,
                   help="Steps per epoch (default: full dataset).")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--snapshot", default=None,
                   help="Resume from this checkpoint path, or 'auto' to "
                        "pick the latest under --snapshot-path.")
    p.add_argument("--snapshot-path", default="./snapshots")
    p.add_argument("--no-snapshots", action="store_true")
    p.add_argument("--snapshot-every", type=int, default=1,
                   help="checkpoint every N epochs (last epoch always "
                        "saved); a full-params device->host pull per "
                        "checkpoint is expensive on a remote-attached chip")
    p.add_argument("--sync-snapshots", action="store_true",
                   help="save checkpoints synchronously (default: the "
                        "device->host pull + write overlap the next "
                        "epoch's training via AsyncCheckpointSaver)")
    p.add_argument("--freeze-backbone", action="store_true")
    p.add_argument("--random-transform", action="store_true")
    p.add_argument("--image-min-side", type=int, default=800)
    p.add_argument("--image-max-side", type=int, default=1333)
    p.add_argument("--no-evaluation", action="store_true")
    p.add_argument("--backbone-h5", default=None,
                   help="keras_resnet ImageNet h5: initialise the backbone "
                        "from it, keep fresh FPN/head init (mirrors the "
                        "reference's imagenet default, bin/train.py:349-352)")
    p.add_argument("--weights", default=None,
                   help="Initialize from an exported .npz weight file.")
    p.add_argument("--imagenet-weights", action="store_true",
                   help="download keras_resnet ImageNet weights (md5 "
                        "verified, cached under ~/.gpp_tpu/models) and "
                        "initialise the backbone from them — the "
                        "reference's default init (bin/train.py:349-352); "
                        "requires network egress, otherwise use "
                        "--backbone-h5 with a pre-downloaded file")
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard the batch over all visible devices.")
    p.add_argument("--fused-prepare", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="fuse device-side augmentation + anchor-target "
                        "assignment INTO the jitted train step (one device "
                        "dispatch per step instead of two; numerically "
                        "identical and phase-robust on the relay — "
                        "tools/profile_train_wall.py A/B). "
                        "--no-fused-prepare restores the two-stage "
                        "producer-thread prepare")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks on backward "
                        "(jax.checkpoint): less HBM, ~1 extra forward")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32).")
    p.add_argument("--log-path", default="training_log.jsonl")
    p.add_argument("--tensorboard-dir", default=None,
                   help="also mirror per-epoch scalars into TensorBoard "
                        "event files (reference bin/train.py:142-154)")
    p.add_argument("--compat-height-only-dim-loss", action="store_true",
                   help="Reproduce the reference's height-only dim loss.")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.dataset_type != "kitti":
        raise SystemExit("only the kitti dataset is supported (like the "
                         "reference's implemented subset)")

    from ..data.kitti import KittiDataset
    from ..data.pipeline import KittiLoader
    from ..models import build_detector
    from ..parallel import data_parallel_mesh, initialize
    from ..training.checkpoint import (import_params, latest_checkpoint,
                                       restore_checkpoint)

    initialize()  # multi-host no-op on a single host
    from ..training.loop import fit
    from ..training.train import (create_train_state, make_optimizer,
                                  make_sharded_train_step, make_train_step)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    train_ds = KittiDataset(args.kitti_path, "train")
    train_loader = KittiLoader(
        train_ds, batch_size=args.batch_size,
        image_min_side=args.image_min_side,
        image_max_side=args.image_max_side,
        augment=args.random_transform,
        raw_batches=args.fused_prepare)
    val_loader = None
    if not args.no_evaluation:
        val_ds = KittiDataset(args.kitti_path, "val")
        val_loader = KittiLoader(
            val_ds, batch_size=1, image_min_side=args.image_min_side,
            image_max_side=args.image_max_side, shuffle=False)

    model = build_detector(args.backbone, num_classes=train_ds.num_classes,
                           dtype=dtype, remat=args.remat)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *train_loader.image_shape, 3), jnp.float32))
    if args.weights:
        if args.weights.endswith((".h5", ".hdf5")):
            from ..models.h5_import import load_reference_h5
            loaded = load_reference_h5(args.weights, backbone=args.backbone)
        else:
            loaded = import_params(args.weights)
        variables = {**variables, **loaded}
    backbone_h5 = args.backbone_h5
    if args.imagenet_weights and not backbone_h5:
        from ..models.imagenet import download_imagenet
        backbone_h5 = download_imagenet(args.backbone)
    if backbone_h5:
        from ..models.h5_import import load_reference_h5, merge_backbone
        variables = merge_backbone(
            variables, load_reference_h5(backbone_h5,
                                         backbone=args.backbone,
                                         backbone_only=True))

    tx = make_optimizer(clipnorm=0.001, freeze_backbone=args.freeze_backbone)
    state = create_train_state(variables, tx, learning_rate=args.lr)
    if args.snapshot == "auto":
        latest = latest_checkpoint(args.snapshot_path)
        if latest:
            print(f"resuming from {latest}")
            state = restore_checkpoint(latest, state)
    elif args.snapshot:
        state = restore_checkpoint(args.snapshot, state)

    eval_mesh = None
    mesh = None
    if args.data_parallel and jax.device_count() > 1:
        mesh = data_parallel_mesh()
        eval_mesh = mesh
    if args.fused_prepare:
        from ..training.train import make_fused_train_step
        fused_step = make_fused_train_step(
            model, tx, loader=train_loader,
            compat_height_only=args.compat_height_only_dim_loss,
            mesh=mesh)
        if mesh is None:
            step = fused_step
        else:
            from ..parallel import make_global_raw_batch

            def step(state, raw):
                return fused_step(state, make_global_raw_batch(mesh, raw))
    elif mesh is not None:
        from ..parallel import make_global_batch
        raw_step = make_sharded_train_step(
            model, tx, mesh, compat_height_only=args.compat_height_only_dim_loss)

        def step(state, batch):
            # make_global_batch (not shard_batch): identical single-process,
            # and correct when jax.distributed spans multiple hosts (each
            # host contributes its local_batch_slice rows)
            return raw_step(state, make_global_batch(mesh, batch))
    else:
        step = make_train_step(
            model, tx, compat_height_only=args.compat_height_only_dim_loss)

    state = fit(
        model, state, step, train_loader,
        epochs=args.epochs, steps_per_epoch=args.steps,
        val_loader=val_loader, num_classes=train_ds.num_classes,
        checkpoint_dir=None if args.no_snapshots else args.snapshot_path,
        checkpoint_every=args.snapshot_every,
        log_path=args.log_path, tensorboard_dir=args.tensorboard_dir,
        eval_mesh=eval_mesh, async_checkpoints=not args.sync_snapshots)
    return state


if __name__ == "__main__":
    main()
