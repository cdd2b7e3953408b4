"""Mixture env (reference envs/rearrange/mixture.py:17-60): environment
states are drawn from a configurable mixture of envstate datasets, each
sampling object meshes from object datasets ({"function": ..., "args": ...}
config refs — the same config idiom the reference uses).

TPU-first: every object dataset's meshes are pre-baked into one candidate
bank; each envstate dataset reduces to a static per-candidate weight
vector. A reset draws the dataset index from `dataset_sampling_config`,
then per-slot candidates from that dataset's weights — all in-jit, no
recompilation."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import blocks as blocks_lib
from robogym_tpu.envs.rearrange import mesh as mesh_env_lib
from robogym_tpu.robot import composite as composite_lib
from robogym_tpu.utils.env_utils import get_function

DEFAULT_OBJECT_CONFIG = {
    "ycb": {
        "function":
            "robogym.envs.rearrange.datasets.objects.local_mesh:create",
        "args": {"mesh_dirname": "ycb"},
    },
    "geom": {
        "function":
            "robogym.envs.rearrange.datasets.objects.local_mesh:create",
        "args": {"mesh_dirname": "geom"},
    },
}
DEFAULT_DATASET_CONFIG = {
    "ycb_dataset": {
        "function":
            "robogym.envs.rearrange.datasets.envstates.random:create",
        "args": {"object_sample_prob": {"ycb": 1.0}},
    },
    "geom_dataset": {
        "function":
            "robogym.envs.rearrange.datasets.envstates.random:create",
        "args": {"object_sample_prob": {"geom": 1.0}},
    },
    "mixed_dataset": {
        "function":
            "robogym.envs.rearrange.datasets.envstates.random:create",
        "args": {"object_sample_prob": {"ycb": 0.5, "geom": 0.5}},
    },
}
DEFAULT_SAMPLING_CONFIG = {
    "ycb_dataset": 0.3, "geom_dataset": 0.3, "mixed_dataset": 0.4,
}


class MixtureRearrangeEnv(mesh_env_lib.MeshRearrangeEnv):
    def __init__(self, constants, parameters, object_config=None,
                 dataset_config=None, dataset_sampling_config=None,
                 dtype=jnp.float32):
        object_config = object_config or DEFAULT_OBJECT_CONFIG
        dataset_config = dataset_config or DEFAULT_DATASET_CONFIG
        sampling = dataset_sampling_config or DEFAULT_SAMPLING_CONFIG

        # instantiate datasets through the function-ref config idiom
        self.object_datasets = {
            name: get_function(cfg)() for name, cfg in object_config.items()
        }
        self.envstate_datasets = {
            name: get_function(cfg)() for name, cfg in dataset_config.items()
        }
        # merged candidate pool: "<dirname>/<object>" -> files
        merged: Dict[str, List[str]] = {}
        for ds in self.object_datasets.values():
            for obj, files in ds.mesh_files.items():
                merged[f"{ds.mesh_dirname}/{obj}"] = files

        super().__init__(constants, parameters,
                         mesh_files_by_name=merged, dtype=dtype)

        names = list(self.bank.names)
        weights = np.stack([
            np.asarray(
                self.envstate_datasets[n].candidate_weights(
                    self.object_datasets, names
                )
            )
            for n in sorted(self.envstate_datasets)
        ])                                              # (D, C)
        probs = np.asarray(
            [sampling.get(n, 0.0) for n in sorted(self.envstate_datasets)]
        )
        self._dataset_logits = jnp.asarray(
            np.log(np.maximum(probs / probs.sum(), 1e-12)), self.dtype
        )
        self._cand_logits = jnp.asarray(
            np.log(np.maximum(weights, 1e-12)), self.dtype
        )

    def _reset_model_fields(self, key: jax.Array):
        k_ds, k_cand, rest = jax.random.split(key, 3)
        ds = jax.random.categorical(k_ds, self._dataset_logits)
        O = self.max_num_objects
        cand = jax.random.categorical(
            k_cand, self._cand_logits[ds][None, :].repeat(O, 0), axis=-1
        )
        return self._fields_for_candidates(cand, rest)

    def _fields_for_candidates(self, cand, key):
        """Bank-row overrides for explicit candidate indices (shared with
        MeshRearrangeEnv's random path)."""
        O = self.max_num_objects
        mids = jnp.asarray(self._slot_mesh_ids)
        group_ids, colors = self._sample_object_groups(key)
        fields = {
            "mesh_convex_vert": self.model.mesh_convex_vert.at[mids].set(
                self.bank.hull_vert[cand]
            ),
            "mesh_convex_mask": self.model.mesh_convex_mask.at[mids].set(
                self.bank.hull_mask[cand]
            ),
            "body_mass": self.model.body_mass.at[
                jnp.asarray(self.idx.object_body_ids)
            ].set(self.bank.mass[cand]),
            "body_inertia": self.model.body_inertia.at[
                jnp.asarray(self.idx.object_body_ids)
            ].set(self.bank.inertia[cand]),
            "body_iquat": self.model.body_iquat.at[
                jnp.asarray(self.idx.object_body_ids)
            ].set(self.bank.iquat[cand]),
            "body_ipos": self.model.body_ipos.at[
                jnp.asarray(self.idx.object_body_ids)
            ].set(jnp.zeros((O, 3), self.dtype)),
            "geom_size": self.model.geom_size.at[
                jnp.asarray(self.idx.object_geom_ids)
            ].set(self.bank.bbox_half[cand]),
            "geom_rgba": self.model.geom_rgba.at[
                jnp.asarray(self.idx.object_geom_ids)
            ].set(colors),
        }
        return fields, self.bank.bbox_half[cand], group_ids


def make_env(constants=None, parameters=None, dtype=jnp.float32, **kw):
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    object_config = cst_kw.pop("object_config", None)
    dataset_config = cst_kw.pop("dataset_config", None)
    sampling = cst_kw.pop("dataset_sampling_config", None)
    cst = mesh_env_lib.MeshRearrangeEnvConstants(**cst_kw)
    par_kw = dict(parameters or {})
    sp = blocks_lib.RearrangeSimParameters(
        **par_kw.pop("simulation_params", {})
    )
    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par = blocks_lib.RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    return MixtureRearrangeEnv(
        cst, par, object_config=object_config, dataset_config=dataset_config,
        dataset_sampling_config=sampling, dtype=dtype,
    )
