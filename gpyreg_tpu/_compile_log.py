"""Process-wide XLA compile accounting (VERDICT r4 #7).

Remote-TPU compiles are minutes-scale at 16k shapes (CLAUDE.md), so
every fit configuration change that triggers fresh programs is a
first-class cost.  ``GP.fit`` snapshots these counters around each fit
and reports ``fit_timings["n_compiles"] / ["compile_s"]`` so a
protocol change's compile bill is visible next to the phase walls.

Uses jax.monitoring's backend_compile duration event — fires once per
actual backend compilation (cache hits don't), with the wall time.
"""

import threading

import jax.monitoring

_lock = threading.Lock()
_n = 0
_secs = 0.0
_registered = False

_EVENT = "/jax/core/compile/backend_compile_duration"


def _listener(event, dur, **_kw):
    global _n, _secs
    if event == _EVENT:
        with _lock:
            _n += 1
            _secs += float(dur)


def ensure_registered():
    global _registered
    with _lock:
        if not _registered:
            jax.monitoring.register_event_duration_secs_listener(
                _listener
            )
            _registered = True


def snapshot():
    """(total compiles, total compile seconds) so far this process."""
    ensure_registered()
    with _lock:
        return _n, _secs
