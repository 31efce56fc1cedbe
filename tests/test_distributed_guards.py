"""Fast, default-lane guards for parallel/distributed.py (the full
2-process multi-host run lives in the slow lane, test_distributed.py)."""

import pytest

from ground_plane_polling_tpu.parallel import distributed


def test_initialize_rejects_broken_multihost_env(monkeypatch):
    """COORDINATOR_ADDRESS + a nonzero PROCESS_ID with NUM_PROCESSES
    unset is a broken launch: silently proceeding would train N
    independent copies. Must raise, not no-op."""
    monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:9999")
    monkeypatch.setenv("PROCESS_ID", "1")
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    with pytest.raises(ValueError, match="NUM_PROCESSES"):
        distributed.initialize()
    # a plain single-host env (nothing set) stays a clean no-op
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("PROCESS_ID", raising=False)
    distributed.initialize()
