"""Map checkpoint / resume.

The reference left SaveMap/LoadMap as a TODO (include/System.h:115-117);
here the map is one pytree of arrays, so checkpointing is a single
compressed-npz round trip — implemented as a real feature per SURVEY.md §5.
"""

from __future__ import annotations

import numpy as np

from ..models import map_state as ms


def save_map(path: str, m: ms.MapState) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in m._asdict().items()})


def load_map(path: str) -> ms.MapState:
    import jax.numpy as jnp

    data = np.load(path)
    return ms.MapState(**{k: jnp.asarray(data[k]) for k in ms.MapState._fields})
