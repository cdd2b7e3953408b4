"""Material library for rearrange objects.

Reference: /root/reference/robogym/envs/rearrange/common/utils.py:1023-1046
(`load_all_materials`, `load_material_args` — jsonnet files under
envs/rearrange/materials/) consumed by the env base's per-group material
sampling (common/base.py:568-585 `_sample_object_materials`); the args are
spliced into object XML at sim recreation.

TPU-native shape: there is no per-reset sim recreation — materials become
per-episode RUNTIME Model field rows (geom_friction / geom_solref /
geom_margin, plus a density-driven mass/inertia rescale) for the object
geoms, carried in `EnvState.model_fields` like every other sim
randomization. The material TABLE is baked host-side as stacked numpy rows
so the per-episode pick is one gather on a sampled group->material index.
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache
from typing import Dict, List, Sequence

import numpy as np

from robogym_tpu.utils import jsonnet

MATERIAL_DIR = os.environ.get(
    "ROBOGYM_TPU_MATERIALS",
    "/root/reference/robogym/envs/rearrange/materials",
)

# MuJoCo compiler defaults the reference's block/mesh XMLs inherit when a
# material doesn't override them.
_DEFAULT_DENSITY = 1000.0
_DEFAULT_FRICTION = (1.0, 0.005, 0.0001)


def load_all_materials() -> List[str]:
    """Names of every material jsonnet (utils.py:1023-1033)."""
    return sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(MATERIAL_DIR, "*.jsonnet"))
    )


@lru_cache()
def load_material_args(material_name: str) -> dict:
    """Evaluate one material jsonnet (utils.py:1037-1046)."""
    return jsonnet.evaluate_file(
        os.path.join(MATERIAL_DIR, f"{material_name}.jsonnet")
    )


def _parse_vec(s, n):
    v = np.array([float(x) for x in str(s).split()], np.float64)
    assert len(v) == n, f"expected {n} components, got {s!r}"
    return v


class MaterialTable:
    """Stacked per-material geom rows for on-device episode sampling.

    Row layout per material: friction (3,), solref (2,), margin (1,),
    density ratio vs the compiled default (1,). A sampled (O,) object ->
    material index turns into model_fields rows with one gather.
    """

    def __init__(self, material_names: Sequence[str]):
        self.names = list(material_names)
        fric, solref, margin, dens = [], [], [], []
        for name in self.names:
            g: Dict = load_material_args(name).get("geom", {})
            fric.append(
                _parse_vec(g["friction"], 3) if "friction" in g
                else np.asarray(_DEFAULT_FRICTION)
            )
            # negative solref = direct (stiffness, damping) spec; keep 0 to
            # mean "leave the compiled value" so materials without solref
            # don't stomp the block defaults
            solref.append(
                _parse_vec(g["solref"], 2) if "solref" in g
                else np.zeros(2)
            )
            margin.append(float(g.get("margin", 0.0)))
            dens.append(float(g.get("density", _DEFAULT_DENSITY))
                        / _DEFAULT_DENSITY)
        self.friction = np.stack(fric)            # (M, 3)
        self.solref = np.stack(solref)            # (M, 2)
        self.margin = np.asarray(margin)          # (M,)
        self.density_ratio = np.asarray(dens)     # (M,)

    def model_fields(self, m, object_geom_ids: np.ndarray,
                     object_body_ids: np.ndarray, mat_idx):
        """Per-episode model_fields dict for a sampled (O,) material index
        (jnp array). Mass/inertia scale linearly with density at fixed
        geometry."""
        import jax.numpy as jnp

        gids = jnp.asarray(object_geom_ids)
        bids = jnp.asarray(object_body_ids)
        fric = jnp.asarray(self.friction, m.geom_friction.dtype)[mat_idx]
        sref = jnp.asarray(self.solref, m.geom_solref.dtype)[mat_idx]
        marg = jnp.asarray(self.margin, m.geom_margin.dtype)[mat_idx]
        dr = jnp.asarray(self.density_ratio, m.body_mass.dtype)[mat_idx]
        solref_rows = jnp.where(
            jnp.any(sref != 0.0, axis=-1, keepdims=True),
            sref, m.geom_solref[gids],
        )
        return {
            "geom_friction": m.geom_friction.at[gids].set(fric),
            "geom_solref": m.geom_solref.at[gids].set(solref_rows),
            "geom_margin": m.geom_margin.at[gids].set(marg),
            "body_mass": m.body_mass.at[bids].mul(dr),
            "body_inertia": m.body_inertia.at[bids].mul(dr[:, None]),
        }
