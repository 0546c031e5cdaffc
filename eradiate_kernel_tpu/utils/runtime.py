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
           controller: RenderController | None = None, develop_film=True):
    """integrators.render with progress/cancellation/timeout services; one
    pass per loop iteration is the cancellation + partial-result boundary."""
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
    run = jax.jit(integrators.render_wavefront,
                  static_argnames=("n_lanes", "spp"))
    for p in range(n_passes):
        if controller is not None and controller.should_stop():
            break
        off = p * samples_per_pass
        n = min(samples_per_pass, total - off)
        film = film + run(scene, jnp.uint32(off), n, seed, spp)
        if controller is not None:
            controller.partial = film
        if reporter:
            reporter.update((p + 1) / n_passes)
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
