"""jax.profiler integration (SURVEY.md §5.1).

The reference only has wall-clock `profile_kv` scopes (logger.py:293-317);
on TPU the real tool is the XLA profiler: `--profile_dir <dir>` on the train
and sample scripts captures a TensorBoard trace of the first
`--profile_steps` steps, with named TraceAnnotations around the data/step/val
scopes so host and device time line up in the timeline view.
"""

from __future__ import annotations

import contextlib

import jax


class StepProfiler:
    """Capture a jax.profiler trace over a window of steps.

    Usage:
        prof = StepProfiler(profile_dir, first_step=1, num_steps=3)
        for step in ...:
            prof.maybe_start(step)
            with prof.step_scope(step): ...
            prof.maybe_stop(step)

    Profiling starts at `first_step` (skipping the compile-heavy step 0 by
    default, which would drown the trace) and stops after `num_steps`.
    No-ops entirely when profile_dir is falsy.
    """

    def __init__(self, profile_dir: str | None, first_step: int = 1, num_steps: int = 3):
        self.profile_dir = profile_dir or None
        self.first_step = first_step
        self.last_step = first_step + num_steps - 1
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.profile_dir and not self._active and step == self.first_step:
            jax.profiler.start_trace(self.profile_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.last_step:
            jax.profiler.stop_trace()
            self._active = False

    def step_scope(self, step: int):
        if not self.profile_dir:
            return contextlib.nullcontext()
        return jax.profiler.StepTraceAnnotation("step", step_num=step)

    def stop(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def annotate(name: str):
    """Named scope visible in the TensorBoard trace timeline (host + device)."""
    return jax.profiler.TraceAnnotation(name)
