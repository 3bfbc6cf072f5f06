"""Broadcast small lookup sides (dimension tables, polygon indexes, query
matrices) with ``ray.put`` ONCE, then read the object ref inside each
actor's ``__init__`` — never re-ship per batch, never shuffle-join a small
side (SURVEY.md §4 / ray_guide "Joins and lookups").
"""

from __future__ import annotations

from typing import Any


def put_once(obj: Any):
    """ray.put the object; returns the ObjectRef to hand to actor ctors."""
    import ray
    return ray.put(obj)


class BroadcastLookup:
    """Base class for actor-pool stages holding one broadcast object.

    Subclasses get ``self.state`` resolved exactly once per actor process:

        class PIP(BroadcastLookup):
            def __call__(self, batch): ... use self.state ...

        ds.map_batches(PIP, fn_constructor_args=(ref,), concurrency=8, ...)
    """

    def __init__(self, ref):
        import ray
        self.state = ray.get(ref) if hasattr(ref, "hex") else ref
