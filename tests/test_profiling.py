import jax.numpy as jnp

from ground_plane_polling_tpu.utils.profiling import StageTimer, trace


def test_stage_timer_accumulates():
    t = StageTimer()
    x = jnp.ones((8, 8))
    for _ in range(3):
        with t.stage("matmul") as s:
            s.result = x @ x
    assert t.counts["matmul"] == 3
    assert t.totals["matmul"] > 0
    assert "matmul" in t.summary()


def test_trace_noop_without_logdir():
    with trace("anything", logdir=None):
        assert (jnp.ones(3) + 1).sum() == 6.0
