"""Preemption-safe training: SIGTERM -> finish step -> save -> clean stop.

The reference has no preemption handling (SURVEY §5: its only cleanup is
``accelerator.end_training``, ``src/trainer/common.py:483-486``); this is a
deliberate TPU-production improvement — cloud TPU preemptions deliver
SIGTERM with a grace window.
"""

import os
import signal

from tests.training.test_checkpoint_resume import _make_trainer


def test_sigterm_saves_and_stops_cleanly(tmp_path):
    trainer = _make_trainer(tmp_path, resume=False, epochs=50, per_steps=1000)
    seen_steps = []
    orig_prepare = trainer.model.prepare_batch

    def prepare_and_preempt(batch, key):
        seen_steps.append(trainer.global_step)
        if trainer.global_step == 2:
            # real signal delivery, mid-loop (handled at the next bytecode
            # boundary -> the in-flight step still completes)
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_prepare(batch, key)

    trainer.model.prepare_batch = prepare_and_preempt
    trainer.training_loop()  # must return, not die

    # stopped right after the step that received the signal
    assert trainer._preempted
    assert trainer.global_step == 3
    # full train state was written at the preemption step
    assert trainer.checkpointer.latest_step() == 3

    # default SIGTERM disposition restored after the loop
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.Handlers.SIG_DFL
    )

    # and a resumed trainer picks up exactly there
    resumed = _make_trainer(tmp_path, resume=True, epochs=50, per_steps=1000)
    assert resumed.global_step == 3


def test_sigterm_on_periodic_save_step_is_idempotent(tmp_path):
    """SIGTERM landing on a step that just did a periodic save must not
    crash on orbax StepAlreadyExistsError: the preemption save is a no-op
    for an already-saved step."""
    trainer = _make_trainer(tmp_path, resume=False, epochs=50, per_steps=2)
    orig_prepare = trainer.model.prepare_batch

    def prepare_and_preempt(batch, key):
        if trainer.global_step == 1:
            # the signal is handled after step 2 completes — exactly when
            # the per_steps=2 periodic save also fires for step 2
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_prepare(batch, key)

    trainer.model.prepare_batch = prepare_and_preempt
    trainer.training_loop()  # must return, not raise
    assert trainer._preempted
    assert trainer.global_step == 2
    assert trainer.checkpointer.latest_step() == 2
    resumed = _make_trainer(tmp_path, resume=True, epochs=50, per_steps=2)
    assert resumed.global_step == 2


def test_sigterm_during_epoch_teardown_still_checkpoints(tmp_path):
    """A SIGTERM landing AFTER the last per-step check (inside
    after_train_epoch / epoch teardown) used to be lost entirely — no
    preemption checkpoint and no final save. training_loop now re-checks
    after the epochs return."""
    trainer = _make_trainer(tmp_path, resume=False, epochs=1, per_steps=1000)
    orig_after = trainer.model.after_train_epoch

    def after_and_preempt():
        os.kill(os.getpid(), signal.SIGTERM)
        return orig_after()

    trainer.model.after_train_epoch = after_and_preempt
    trainer.training_loop()  # must return, not die
    assert trainer._preempted
    # the late signal still produced a durable train-state checkpoint
    assert trainer.checkpointer.latest_step() == trainer.global_step
    assert trainer.global_step == 2  # the full epoch ran


def test_sigterm_without_checkpointer_stops_without_saving(tmp_path):
    trainer = _make_trainer(tmp_path, resume=False, epochs=50, per_steps=1000)
    trainer.checkpointer = None
    orig_prepare = trainer.model.prepare_batch

    def prepare_and_preempt(batch, key):
        if trainer.global_step == 1:
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_prepare(batch, key)

    trainer.model.prepare_batch = prepare_and_preempt
    trainer.training_loop()
    assert trainer._preempted
    assert trainer.global_step == 2
