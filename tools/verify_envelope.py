"""Cross-check the bench envelope with long differencing pairs.

The headline protocol (bench.py) differences 5- and 25-iteration chained
runs; a relay phase flip BETWEEN the pair's runs can inflate an estimate
by ~10% beyond the true fast-phase rate, and robust_estimates only drops
>2x-median artifacts. This tool interleaves, within one session:

  short pairs: (N1, N2) = (5, 25)    — the headline protocol
  long  pairs: (N1, N2) = (25, 125)  — 5x the differenced span; a phase
              flip mid-pair moves the estimate 5x less

If the short-pair envelope is real, the long-pair envelope matches it.
If it is a flip artifact, the long-pair envelope sits near the median.

Usage (TPU, one python at a time):
  tools/tpu_run.sh python tools/verify_envelope.py [batch ...]
"""

import os
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (IMAGE_SHAPE, TOP_K, _inputs, chained_run,  # noqa: E402
                   corroborated_envelope, robust_estimates)

WINDOW_SECS = 180.0


def measure(fn, variables, images, P_inv, planes, pairs):
    """Interleave (n1, n2) differencing pairs across one window; returns
    {pair: sorted per-iter estimates}."""
    chained_run(fn, variables, images, P_inv, planes, 2)
    out = {p: [] for p in pairs}
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < WINDOW_SECS:
        for n1, n2 in pairs:
            t1 = chained_run(fn, variables, images, P_inv, planes, n1)
            t2 = chained_run(fn, variables, images, P_inv, planes, n2)
            out[(n1, n2)].append((t2 - t1) / (n2 - n1))
        time.sleep(3.0)
    return {p: robust_estimates(v) for p, v in out.items()}


def main():
    import jax

    from ground_plane_polling_tpu.inference import make_detect_fn
    from ground_plane_polling_tpu.models import build_detector

    batches = [int(b) for b in sys.argv[1:]] or [1, 4]
    rng = np.random.RandomState(0)
    model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
    fn = make_detect_fn(model, IMAGE_SHAPE, num_classes=1, with_pose=True,
                        pre_nms_top_k=TOP_K)
    for b in batches:
        images, P_inv, planes = _inputs(rng, b)
        res = measure(fn, variables, images, P_inv, planes,
                      [(5, 25), (25, 125)])
        for (n1, n2), est in sorted(res.items()):
            # raw envelope (max rate) is printed deliberately — this tool
            # DIAGNOSES the differencing artifact, so the uncorrected value
            # is the signal; the corroborated column is what bench.py's
            # shared protocol would report on the same samples.
            rates = sorted(b / e for e in est)
            print(f"b{b} pair=({n1},{n2}) n={len(rates)} "
                  f"raw_envelope={rates[-1]:.1f} img/s "
                  f"corroborated={b / corroborated_envelope(est):.1f} "
                  f"median={rates[len(rates) // 2]:.1f} "
                  f"min={rates[0]:.1f}", flush=True)


if __name__ == "__main__":
    main()
