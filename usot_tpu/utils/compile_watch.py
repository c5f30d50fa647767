"""Observability for XLA compiles and the persistent compilation cache.

The bench / driver path compiles a handful of big scan programs whose
cold compile through the dev tunnel is minutes; with the persistent
cache (`jax_compilation_cache_dir`) warm runs should be ~seconds. This
module makes that observable: a `CompileWatch` subscribes to jax's
monitoring events and attributes, per named phase,

  - backend_compile seconds actually spent (cache misses),
  - persistent-cache requests / hits / retrieval seconds,
  - compile seconds SAVED by hits (as recorded at cache-write time).

Used by bench.py so every BENCH_r* tail shows whether the big programs
compiled cold or loaded warm (VERDICT r4 weak #3: the 865 s r4 warmup
was indistinguishable from a tunnel stall).

jax event names (jax/_src/compiler.py:435-452, dispatch.py:60-62):
  /jax/compilation_cache/compile_requests_use_cache   (counter)
  /jax/compilation_cache/cache_hits                   (counter)
  /jax/compilation_cache/compile_time_saved_sec       (duration)
  /jax/compilation_cache/cache_retrieval_time_sec     (duration)
  /jax/core/compile/backend_compile_duration          (duration)
"""
from __future__ import annotations

import contextlib
import time
from collections import Counter, defaultdict

_REQUESTS = "/jax/compilation_cache/compile_requests_use_cache"
_HITS = "/jax/compilation_cache/cache_hits"
_SAVED = "/jax/compilation_cache/compile_time_saved_sec"
_RETRIEVAL = "/jax/compilation_cache/cache_retrieval_time_sec"
_BACKEND = "/jax/core/compile/backend_compile_duration"


class CompileWatch:
    """Singleton-ish: register once per process, snapshot per phase."""

    def __init__(self):
        self.counts = Counter()
        self.durations = defaultdict(float)
        from jax._src import monitoring
        monitoring.register_event_listener(self._on_event)
        monitoring.register_event_duration_secs_listener(self._on_dur)

    def _on_event(self, name, **kw):
        self.counts[name] += 1

    def _on_dur(self, name, secs, **kw):
        self.durations[name] += secs

    def snapshot(self) -> dict:
        return {
            "requests": self.counts[_REQUESTS],
            "hits": self.counts[_HITS],
            "backend_compile_s": self.durations[_BACKEND],
            "saved_s": self.durations[_SAVED],
            "retrieval_s": self.durations[_RETRIEVAL],
        }

    @staticmethod
    def _delta(a: dict, b: dict) -> dict:
        return {k: b[k] - a[k] for k in a}

    def format_delta(self, d: dict, wall_s: float) -> str:
        misses = d["requests"] - d["hits"]
        return (f"{wall_s:.1f}s wall | compiles: {d['hits']} cached "
                f"({d['retrieval_s']:.1f}s load, {d['saved_s']:.0f}s "
                f"saved) + {misses} cold ({d['backend_compile_s']:.1f}s "
                f"backend)")

    @contextlib.contextmanager
    def phase(self, name: str, log=None):
        """Context manager: logs cache/compile attribution for a code
        region via `log(msg)` (default print-to-stderr)."""
        before = self.snapshot()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            wall = time.perf_counter() - t0
            d = self._delta(before, self.snapshot())
            msg = f"compile[{name}]: {self.format_delta(d, wall)}"
            if log is None:
                import sys
                print(msg, file=sys.stderr, flush=True)
            else:
                log(msg)


_WATCH = None


def get_watch() -> CompileWatch:
    global _WATCH
    if _WATCH is None:
        _WATCH = CompileWatch()
    return _WATCH
