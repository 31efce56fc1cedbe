"""Convert a training JSONL log into TensorBoard event files.

The training loop writes JSONL as the source of truth (and can mirror to
TB live via --tensorboard-dir); this converts existing logs after the fact
(reference counterpart: the Keras TensorBoard callback,
/root/reference/keras_retinanet_3D/bin/train.py:142-154).

  python -m ground_plane_polling_tpu.bin.logs_to_tb training_log.jsonl tb/
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert a JSONL training log to TensorBoard events.")
    p.add_argument("jsonl_path")
    p.add_argument("logdir")
    p.add_argument("--step-key", default="epoch")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from ..utils.tensorboard import jsonl_to_tensorboard

    n = jsonl_to_tensorboard(args.jsonl_path, args.logdir,
                             step_key=args.step_key)
    print(f"wrote {n} records to {args.logdir}")


if __name__ == "__main__":
    main()
