"""Render-loop runtime services: progress, cooperative cancellation,
timeouts, phase profiling.

Counterparts of the reference's ProgressReporter (progress.h:15),
Integrator::cancel()/timeout (integrator.h:51,143-146, integrator.cpp:35),
the SIGHUP partial develop (mitsuba.cpp:76-119), and the sampling profiler's
scoped phases (profiler.h:18-44) — mapped onto pass-granular host callbacks
and jax profiler annotations (the pass loop is the natural cancellation and
checkpoint boundary, SURVEY §5.3).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


class ProgressReporter:
    """ETA progress line over render passes (progress.h analog)."""

    def __init__(self, label="Rendering", stream=None):
        import sys
        self.label = label
        self.stream = stream or sys.stderr
        self.t0 = time.time()

    def update(self, done: float):
        done = min(max(done, 1e-6), 1.0)
        elapsed = time.time() - self.t0
        eta = elapsed * (1.0 - done) / done
        bar = "=" * int(32 * done)
        self.stream.write(f"\r{self.label}: [{bar:<32}] {done*100:5.1f}% "
                          f"(ETA {eta:5.1f}s)")
        if done >= 1.0:
            self.stream.write("\n")
        self.stream.flush()


class RenderController:
    """Cooperative cancellation + wall-clock timeout, checked between passes
    (Integrator::cancel / m_timeout). ``partial`` holds the last accumulated
    film so an interrupted render can still be developed (SIGHUP analog)."""

    def __init__(self, timeout=None):
        self.timeout = timeout
        self._stop = False
        self.t0 = time.time()
        self.partial = None

    def cancel(self):
        self._stop = True

    def should_stop(self) -> bool:
        if self._stop:
            return True
        return (self.timeout is not None
                and time.time() - self.t0 > self.timeout)


def render(scene, seed=0, spp=None, samples_per_pass=None, progress=False,
           controller: RenderController | None = None, develop_film=True,
           checkpoint_path=None):
    """integrators.render with progress/cancellation/timeout services; one
    pass per loop iteration is the cancellation + partial-result boundary.

    ``checkpoint_path``: crash-resumable rendering (SURVEY 5.3/5.4 — the
    reference has only the SIGHUP partial develop). After every pass the
    accumulated film + pass index + render identity (seed/spp/film shape)
    are written to ``<path>.tmp`` and atomically renamed to ``<path>``; on
    start, a matching checkpoint resumes from its pass index, a mismatched
    one is ignored. Each ``samples_per_pass`` pass is the natural resume
    point (integrator.cpp:59-65 pass granularity).
    """
    import numpy as np
    import jax.numpy as jnp

    from .. import integrators
    from ..films import N_BASE_CHANNELS, develop

    cfg = scene.config
    spp = spp or cfg.spp
    W, H = cfg.film_width, cfg.film_height
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    total = cw * ch * spp
    if samples_per_pass is None:
        samples_per_pass = min(total, 1 << 20)
    n_passes = -(-total // samples_per_pass)

    reporter = ProgressReporter() if progress else None
    extra = integrators.n_aov(cfg)
    film = jnp.zeros((ch, cw, N_BASE_CHANNELS + extra))
    start_pass = 0

    ident = np.asarray([seed, spp, cw, ch, samples_per_pass], np.int64)
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        try:
            data = np.load(checkpoint_path)
            if ((data["ident"] == ident).all()
                    and data["film"].shape == tuple(film.shape)):
                film = jnp.asarray(data["film"])
                start_pass = int(data["next_pass"])
        except Exception:
            pass  # unreadable/foreign checkpoint: start fresh

    run = jax.jit(integrators.render_wavefront,
                  static_argnames=("n_lanes", "spp"))
    for p in range(start_pass, n_passes):
        if controller is not None and controller.should_stop():
            break
        off = p * samples_per_pass
        n = min(samples_per_pass, total - off)
        film = film + run(scene, jnp.uint32(off), n, seed, spp)
        if controller is not None:
            controller.partial = film
        if checkpoint_path is not None:
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as fh:
                np.savez(fh, film=np.asarray(film), next_pass=p + 1,
                         ident=ident)
            os.replace(tmp, checkpoint_path)
        if reporter:
            reporter.update((p + 1) / n_passes)
    if (checkpoint_path is not None and os.path.exists(checkpoint_path)
            and not (controller is not None and controller.should_stop())):
        os.remove(checkpoint_path)  # completed: checkpoint no longer needed
    if not develop_film:
        return film
    mode = "mono" if cfg.variant.is_monochromatic else "rgb"
    return develop(film[..., :N_BASE_CHANNELS], mode, cfg.pixel_format)


# =============================================================================
# profiling phases (profiler.h ScopedPhase -> jax named scopes + traces)
# =============================================================================

@contextlib.contextmanager
def scoped_phase(name: str):
    """Annotate a region for the jax/XLA profiler (ProfilerPhase analog)."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto
    (jax.profiler.trace wrapper — the Profiler report analog)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# =============================================================================
# logging (logger.h / appender.h / formatter.h analog)
# =============================================================================

TRACE, DEBUG, INFO, WARN, ERROR = 0, 1, 2, 3, 4
_LEVEL_NAMES = {TRACE: "TRACE", DEBUG: "DEBUG", INFO: "INFO",
                WARN: "WARN", ERROR: "ERROR"}


class DefaultFormatter:
    """'[time] [class] [level] message' line format (formatter.h
    DefaultFormatter)."""

    def format(self, level, cls, msg):
        ts = time.strftime("%H:%M:%S")
        tag = _LEVEL_NAMES.get(level, str(level))
        where = f" [{cls}]" if cls else ""
        return f"{ts} {tag}{where}: {msg}"


class StreamAppender:
    """Write formatted records to a stream (appender.h StreamAppender)."""

    def __init__(self, stream=None):
        import sys
        self.stream = stream or sys.stderr

    def append(self, level, text):
        self.stream.write(text + "\n")
        try:
            self.stream.flush()
        except Exception:
            pass


class Logger:
    """Leveled logger with pluggable appender fan-out (logger.h:11-31):
    records at or above ``log_level`` go to every registered appender;
    ERROR raises (the reference's Throw-on-Error contract)."""

    def __init__(self, log_level=INFO, formatter=None):
        self.log_level = log_level
        self.formatter = formatter or DefaultFormatter()
        self._appenders = []

    def add_appender(self, appender):
        self._appenders.append(appender)

    def remove_appender(self, appender):
        self._appenders.remove(appender)

    def clear_appenders(self):
        self._appenders.clear()

    @property
    def appenders(self):
        return tuple(self._appenders)

    def log(self, level, msg, cls=None):
        if level >= self.log_level:
            text = self.formatter.format(level, cls, msg)
            for a in self._appenders:
                a.append(level, text)
        if level >= ERROR:
            raise RuntimeError(msg)

    def trace(self, msg, cls=None):
        self.log(TRACE, msg, cls)

    def debug(self, msg, cls=None):
        self.log(DEBUG, msg, cls)

    def info(self, msg, cls=None):
        self.log(INFO, msg, cls)

    def warn(self, msg, cls=None):
        self.log(WARN, msg, cls)

    def error(self, msg, cls=None):
        self.log(ERROR, msg, cls)


_logger = None


def logger() -> Logger:
    """Process-wide default logger (Thread::logger analog — XLA owns
    threading here, so one logger with appender fan-out replaces the
    per-thread instances)."""
    global _logger
    if _logger is None:
        _logger = Logger()
        _logger.add_appender(StreamAppender())
    return _logger
