"""StepProfiler window semantics (the reference's nvtx/cudaProfiler
--prof window, darknet/main_amp.py:350-427, as a jax.profiler trace).

Regression pinned here: both trainers used to call profiler.close() at
the END of every train_epoch, which truncated a window crossing an epoch
boundary after its first step AND made it unrestartable (on_step only
starts at step == start, which never recurs). close() now runs once at
the end of fit(); the window must stay open across epoch boundaries and
stop itself via on_step.
"""

import os

from yolov4_tpu.utils.profiling import StepProfiler


def _drive_epochs(prof, steps_per_epoch, n_epochs, close_each_epoch=False):
    """Simulate the trainers' host-side step loop."""
    active_during = []
    step = 0
    for _ in range(n_epochs):
        for _ in range(steps_per_epoch):
            step += 1
            prof.on_step(step)
            active_during.append((step, prof._active))
        if close_each_epoch:
            prof.close()
    prof.close()
    return dict(active_during)


def test_window_spans_epoch_boundary(tmp_path):
    # 3 steps/epoch: the [10, 14) window crosses the epoch-4/5 boundary
    # (step 12 | 13)
    logdir = str(tmp_path / "prof")
    prof = StepProfiler(logdir, start=10, count=4)
    active = _drive_epochs(prof, steps_per_epoch=3, n_epochs=6)
    # open for exactly steps 10..13, closed before and after
    assert not active[9]
    assert all(active[s] for s in (10, 11, 12, 13)), active
    assert not active[14]
    # the trace reached disk
    assert os.path.isdir(logdir) and len(os.listdir(logdir)) > 0


def test_old_per_epoch_close_would_truncate(tmp_path):
    """Documents WHY close() must not run per-epoch: the old placement
    stops the window at the first epoch boundary and it never restarts."""
    prof = StepProfiler(str(tmp_path / "prof"), start=3, count=4)
    active = _drive_epochs(prof, steps_per_epoch=3, n_epochs=3,
                           close_each_epoch=True)
    assert active[3]          # opened at start
    assert not active[4]      # ...but the epoch-end close killed it
    assert not any(active[s] for s in (4, 5, 6))  # and it never restarts


def test_zero_count_never_traces(tmp_path):
    logdir = str(tmp_path / "prof")
    prof = StepProfiler(logdir, start=1, count=0)
    active = _drive_epochs(prof, steps_per_epoch=5, n_epochs=2)
    assert not any(active.values())
    assert not os.path.isdir(logdir)
