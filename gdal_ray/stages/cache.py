"""Worker-cached task stages: actor-pool semantics without actor-pool
startup.

Ray Data's two ways to run a stateful stage:

1. ``map_batches(Cls, concurrency=N, fn_constructor_kwargs=...)`` —
   a dedicated actor pool. Right for long jobs: explicit resource
   envelope, pinned state. Costs a fresh Python process per actor
   (interpreter start + imports + state build ≈ 1.5-2 s here) every
   time the pipeline runs, and an autoscaling pool never ramps up
   inside a short job.
2. ``map_batches(worker_cached(Cls, **ctor))`` — plain TASKS whose
   callable rebuilds the stage once per WORKER PROCESS via a
   module-global cache keyed by (class, constructor args). Ray reuses
   warm worker processes across tasks and even across pipelines, so
   the state builds once per worker and the imports are already paid.

The flagship fused kernel uses pattern 2 (measured in bench tuning);
this helper makes it reusable for any stage class. Broadcast inputs
should be ``ray.ObjectRef``s (the cache key uses the ref id, the
constructor ``ray.get``s it once per worker).
"""

from __future__ import annotations

_CACHE: dict = {}


def _key_of(v):
    if hasattr(v, "hex"):  # ray.ObjectRef
        return ("ref", v.hex())
    if isinstance(v, (str, int, float, bool, tuple, frozenset, type(None))):
        return v
    # id() is unsafe as a cache key: after the original is GC'd a new
    # object can reuse the id and silently hit a cache entry built from
    # stale state. Require content-addressable inputs instead.
    raise TypeError(
        f"worker_cached constructor kwarg of type {type(v).__name__} is not "
        "cache-keyable; pass a ray.ObjectRef (ray.put the object) or a "
        "hashable primitive"
    )


def worker_cached(cls, **ctor_kwargs):
    """Return a plain callable for ``map_batches`` that instantiates
    ``cls(**ctor_kwargs)`` once per worker process and reuses it."""
    key = (cls.__module__, cls.__qualname__) + tuple(
        sorted((k, _key_of(v)) for k, v in ctor_kwargs.items())
    )

    def stage(batch):
        inst = _CACHE.get(key)
        if inst is None:
            inst = cls(**ctor_kwargs)
            if len(_CACHE) > 8:  # bound worker memory across pipelines
                _CACHE.clear()
            _CACHE[key] = inst
        return inst(batch)

    stage.__name__ = stage.__qualname__ = f"cached_{cls.__name__}"
    return stage
