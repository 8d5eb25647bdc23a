"""Preemption-safety of CheckpointManager's latest/best/epoch swap.

The reference's trainer overwrites ``latest_model.tar`` in place
(audio_zen/trainer/base_trainer.py:194-237) — a kill mid-write loses the
resume point. Our CheckpointManager claims atomicity; these tests kill the
save at each crash window and assert a valid resume point always survives.
"""

import numpy as np
import pytest

from fullsubnet_tpu.checkpoint import CheckpointManager


def _state(tag: float) -> dict:
    return {
        "params": {"w": np.full((4, 3), tag, np.float32)},
        "epoch": np.asarray(int(tag), np.int32),
        "best_score": np.asarray(-tag, np.float32),
    }


def _epoch_of(mgr: CheckpointManager) -> int:
    return int(np.asarray(mgr.restore("latest")["epoch"]))


def test_roundtrip_triplet(tmp_path):
    mgr = CheckpointManager(tmp_path)
    mgr.save(_state(1.0), epoch=1, is_best=True)
    mgr.save(_state(2.0), epoch=2, is_best=False)
    assert _epoch_of(mgr) == 2
    assert int(np.asarray(mgr.restore("best")["epoch"])) == 1
    np.testing.assert_array_equal(
        mgr.restore("epoch_0002")["params"]["w"], np.full((4, 3), 2.0, np.float32)
    )
    # no tmp/old litter after clean saves
    assert not list(tmp_path.glob(".tmp-*")) and not list(tmp_path.glob(".old-*"))


def test_kill_between_renames_recovers_new_state(tmp_path, monkeypatch):
    """Worst window: old 'latest' renamed aside, new tmp not yet renamed in.

    A kill here leaves NO 'latest' on disk — recovery must adopt the
    completed tmp so the resume point is the NEW state, not nothing.
    """
    import fullsubnet_tpu.checkpoint as cp

    mgr = CheckpointManager(tmp_path)
    mgr.save(_state(1.0), epoch=1)

    real_rename = cp.os.rename

    def killing_rename(src, dst):
        real_rename(src, dst)
        if "/.old-latest-" in str(dst) or str(dst).startswith(".old-latest-"):
            raise KeyboardInterrupt("simulated preemption between renames")

    monkeypatch.setattr(cp.os, "rename", killing_rename)
    with pytest.raises(KeyboardInterrupt):
        mgr.save(_state(2.0), epoch=2)
    monkeypatch.setattr(cp.os, "rename", real_rename)

    # disk state a real SIGKILL would leave: no latest, .old + .tmp present
    assert not (tmp_path / "latest").exists()
    assert list(tmp_path.glob(".tmp-latest-*")) and list(tmp_path.glob(".old-latest-*"))

    recovered = CheckpointManager(tmp_path)  # __init__ runs _recover()
    assert _epoch_of(recovered) == 2
    assert not list(tmp_path.glob(".tmp-*")) and not list(tmp_path.glob(".old-*"))


def test_kill_during_write_keeps_old_state(tmp_path, monkeypatch):
    """Kill while the new checkpoint is still being written: the previous
    'latest' must be untouched (it is never deleted before the tmp is
    complete)."""
    import fullsubnet_tpu.checkpoint as cp

    mgr = CheckpointManager(tmp_path)
    mgr.save(_state(1.0), epoch=1)

    def killing_swap(self, ckpt, name, payload):
        raise KeyboardInterrupt("simulated preemption during orbax write")

    monkeypatch.setattr(cp.CheckpointManager, "_swap_in", killing_swap)
    with pytest.raises(KeyboardInterrupt):
        mgr.save(_state(2.0), epoch=2)
    monkeypatch.undo()

    recovered = CheckpointManager(tmp_path)
    assert _epoch_of(recovered) == 1


def test_recover_sweeps_orbax_partial_tmp(tmp_path):
    """A kill DURING the orbax write leaves '.tmp-<name>-<tag>.orbax-
    checkpoint-tmp-*' (incomplete by construction): recovery must sweep
    it, never adopt it, and keep the previous 'latest'."""
    mgr = CheckpointManager(tmp_path)
    mgr.save(_state(1.0), epoch=1)
    partial = tmp_path / ".tmp-latest-deadbeef.orbax-checkpoint-tmp-123456"
    partial.mkdir()
    (partial / "garbage").write_text("incomplete")

    recovered = CheckpointManager(tmp_path)
    assert _epoch_of(recovered) == 1
    assert not list(tmp_path.glob(".tmp-*"))
    # nothing incomplete got promoted to a visible artifact
    names = {p.name for p in tmp_path.iterdir()}
    assert names == {"latest", "epoch_0001"}
