"""Phase timing and profiler hooks.

The reference carries vestigial t1/t2/t3 wall-clock timers whose output
is commented out (reference gaussian_process.py:1094-1228); here the
fit phases are timed for real and exposed on the GP object
(``gp.fit_timings``), and a ``trace_dir`` option captures a full
``jax.profiler`` trace of the fit for tensorboard / xprof.
"""

import contextlib
import time


class PhaseTimer:
    """Accumulates named phase durations (seconds)."""

    def __init__(self):
        self.timings = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = (
                self.timings.get(name, 0.0) + time.perf_counter() - t0
            )


@contextlib.contextmanager
def maybe_profile(trace_dir):
    """jax.profiler.trace(trace_dir) when trace_dir is set, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(trace_dir)):
        yield
