"""Pytree dataclass helper.

Immutable dataclasses registered as JAX pytrees are the framework's
replacement for the reference's mutable field-of-structs containers
(ref: src/weather-sim/cpp/include/weather_sim/weather_sim.hpp:254-412
``WeatherGrid`` with per-field getters/setters). A pytree state flows
through ``jax.jit`` / ``lax.scan`` / ``shard_map`` without any bespoke
swap/copy machinery (ref: weather_grid.cpp:123-142 ``swap``).
"""
from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def static_field(**kwargs):
    """Mark a dataclass field as static (part of the treedef, not a leaf)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[T] | None = None, *, frozen: bool = True):
    """Decorator: make a frozen dataclass that is also a JAX pytree.

    Fields marked with :func:`static_field` go into the treedef (hashable,
    trigger recompilation when changed); all other fields are leaves.
    Instances get a ``.replace(**updates)`` method.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=frozen)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )

        def replace(self, **updates):
            return dataclasses.replace(self, **updates)

        c.replace = replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)
