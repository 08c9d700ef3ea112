"""Grid / octree persistence as .npz — build once, render many times.

The reference rebuilds everything from the OBJ at every launch
(main.cpp:160-178); its 10-run Benchmaker exists precisely because builds
are expensive.  This module adds the missing capability: serialize any
encoding to a single .npz and restore it without re-voxelizing.
"""
from __future__ import annotations

import numpy as np

from ..models.grids import GridAabbStruct, GridBool, GridVec
from ..models.octree import Octree

__all__ = ["save_grid", "load_grid"]

_KINDS = {
    "GridBool": GridBool,
    "GridAabbStruct": GridAabbStruct,
    "GridVec": GridVec,
    "Octree": Octree,
}


def save_grid(path: str, grid) -> None:
    kind = type(grid).__name__
    if kind not in _KINDS:
        raise TypeError(f"cannot checkpoint {kind}")
    import jax

    arrays = {}
    meta = {"kind": kind}
    if kind == "GridBool":
        arrays = {"words": np.asarray(grid.words),
                  "origin": np.asarray(grid.origin)}
        meta.update(dims=grid.dims, voxel_size=grid.voxel_size,
                    set_calls=grid.set_calls)
    elif kind == "GridAabbStruct":
        arrays = {"minimum": np.asarray(grid.minimum),
                  "maximum": np.asarray(grid.maximum),
                  "used": np.asarray(grid.used),
                  "origin": np.asarray(grid.origin)}
        meta.update(dims=grid.dims, voxel_size=grid.voxel_size,
                    set_calls=grid.set_calls)
    elif kind == "GridVec":
        arrays = {"aabbs": np.asarray(grid.aabbs),
                  "origin": np.asarray(grid.origin)}
        meta.update(dims=grid.dims, voxel_size=grid.voxel_size,
                    set_calls=grid.set_calls)
    elif kind == "Octree":
        arrays = {"code_hi": np.asarray(grid.code_hi),
                  "code_lo": np.asarray(grid.code_lo),
                  "item_x": np.asarray(grid.item_x),
                  "item_y": np.asarray(grid.item_y),
                  "item_z": np.asarray(grid.item_z),
                  "children": np.asarray(grid.children),
                  "node_start": np.asarray(grid.node_start),
                  "node_count": np.asarray(grid.node_count),
                  "root_min": np.asarray(grid.root_min)}
        meta.update(dims=grid.dims, voxel_size=grid.voxel_size,
                    bits_per_axis=grid.bits_per_axis,
                    max_items=grid.max_items,
                    origin_key=grid.origin_key, set_calls=grid.set_calls)
    np.savez_compressed(path, __meta__=np.asarray([repr(meta)]), **arrays)


def load_grid(path: str):
    import ast

    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    meta = ast.literal_eval(str(data["__meta__"][0]))
    kind = meta.pop("kind")
    cls = _KINDS[kind]
    arrays = {k: jnp.asarray(v) for k, v in data.items() if k != "__meta__"}
    meta["dims"] = tuple(meta["dims"])
    if "origin_key" in meta:
        meta["origin_key"] = tuple(meta["origin_key"])
    out = cls(**arrays, **meta)
    if kind == "Octree":
        # the flattened-descent region map is derived state (not
        # serialized); rebuild it so a restored tree traces through the
        # fast flat path like a freshly built one
        from ..models.octree import REGION_MAP_MAX_BITS, build_region_map
        import dataclasses
        bits = out.bits_per_axis
        # rebuild for EMPTY trees too: a fresh build carries a (all-empty)
        # region map whenever bits fits, and a restored tree must be
        # structurally identical to a fresh one (jit keys, equality)
        if bits > 0:
            map_bits = min(bits, REGION_MAP_MAX_BITS)
            rm = build_region_map(np.asarray(out.children), bits, map_bits)
            it4 = np.zeros((out.n_items + out.max_items, 4), np.int32)
            it4[: out.n_items, 0] = np.asarray(out.item_x)
            it4[: out.n_items, 1] = np.asarray(out.item_y)
            it4[: out.n_items, 2] = np.asarray(out.item_z)
            out = dataclasses.replace(out, region_map=jnp.asarray(rm),
                                      items4=jnp.asarray(it4),
                                      map_bits=map_bits)
    return out
