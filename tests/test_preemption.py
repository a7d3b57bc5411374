"""Preemption-aware training (SURVEY.md §5.3 — absent in the reference):
SIGTERM latches a flag, the loop checkpoints at the step boundary and exits
cleanly, and resume continues from the preemption checkpoint."""

import pytest
import os
import signal
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from openvla_oft_tpu.training.preemption import PreemptionGuard


def test_guard_latches_sigterm_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.should_stop
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.should_stop
        assert guard.received_signal == signal.SIGTERM
    assert signal.getsignal(signal.SIGTERM) is before


def test_guard_programmatic_stop():
    with PreemptionGuard(signals=[]) as guard:
        assert not guard.should_stop
        guard.request_stop()
        assert guard.should_stop


@pytest.mark.slow
def test_finetune_checkpoints_on_preemption(tmp_path, monkeypatch):
    """Preempt at the 3rd step poll: loop saves step-3 checkpoint + exits;
    resume picks up from it (zero lost steps)."""
    import openvla_oft_tpu.training.preemption as P
    from vla_scripts.finetune import FinetuneConfig, finetune

    polls = {"n": 0}

    def fake_should_stop(self):
        polls["n"] += 1
        return polls["n"] >= 3

    monkeypatch.setattr(P.PreemptionGuard, "should_stop",
                        property(fake_should_stop))

    base = dict(vla_path="random:tiny", data_root_dir=Path("dummy"),
                dataset_name="libero_dummy", batch_size=2, save_freq=100,
                use_proprio=True, run_root_dir=tmp_path,
                use_flash_attention=False, wandb_log_freq=100,
                merge_lora_during_training=False)
    out = finetune(FinetuneConfig(**base, max_steps=50))
    assert out["final_step"] == 3  # stopped long before max_steps
    ckpts = sorted((Path(out["run_dir"]) / "ckpt").iterdir())
    assert [c.name for c in ckpts] == ["000003"]

    monkeypatch.undo()
    out2 = finetune(FinetuneConfig(**base, max_steps=5, resume=True,
                                   run_id_override=Path(out["run_dir"]).name))
    assert out2["final_step"] == 5
