"""Composer env: random multi-mesh composed objects (TPU build).

Re-implements the reference composer
(/root/reference/robogym/envs/rearrange/composer.py:1-47 +
simulation/composer.py RandomMeshComposer): every object is a composition
of `max_geoms_per_object` mesh sub-geoms attached at random offsets.

TPU-first: the reference samples the composition and REBUILDS the XML per
reset; here each object slot is compiled once with a fixed set of mesh
sub-geoms, and the per-reset composition is data —
  * each sub-geom's candidate mesh: `mesh_convex_vert` bank row swap,
  * attachment offsets: `geom_pos` overrides,
  * `num_geoms` randomization: unused sub-geoms point at a tiny
    (1 mm) placeholder hull parked at the object center,
  * mass/inertia: summed sub-hull masses with parallel-axis terms.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs.rearrange import blocks as blocks_lib
from robogym_tpu.envs.rearrange import mesh as mesh_env_lib
from robogym_tpu.envs.rearrange import simulation as sim_lib
from robogym_tpu.robot import composite as composite_lib


@dataclasses.dataclass(frozen=True)
class ComposerEnvConstants(mesh_env_lib.MeshRearrangeEnvConstants):
    max_geoms_per_object: int = 3
    # sub-geom attachment offset scale relative to normalized mesh size
    attachment_radius: float = 0.6


class ComposerRearrangeEnv(mesh_env_lib.MeshRearrangeEnv):
    """Composed-object rearrange env. Sub-geom k of slot i is the geom
    `object{i}` (k=0, the root) or `object{i}:g{k}`."""

    def _compile_world(self, sp, rcp):
        from robogym_tpu.mjcf.compiler import compile_xml
        from robogym_tpu.mjcf.xml_tools import ASSETS_DIR, MjcfXML
        import os

        first = sorted(self._mesh_files)[0]
        stl = self._mesh_files[first][0]
        rel = os.path.relpath(stl, os.path.join(ASSETS_DIR, "stls"))
        K = self.constants.max_geoms_per_object
        xml = sim_lib.build_blocks_world_xml(
            0, robot_control_params=rcp,
            mujoco_timestep=self.constants.mujoco_timestep,
        )
        for i in range(sp.max_num_objects):
            geoms = "\n".join(
                f'<geom name="object{i}{"" if k == 0 else f":g{k}"}" '
                f'type="mesh" mesh="object{i}:mesh{k}" '
                f'rgba="0.8 0.4 0.1 1.0" density="1000"/>'
                for k in range(K)
            )
            assets = "\n".join(
                f'<mesh name="object{i}:mesh{k}" file="{rel}"/>'
                for k in range(K)
            )
            src = f"""
            <mujoco>
              <asset>{assets}</asset>
              <worldbody>
                <body name="object{i}" pos="0.0 0.0 0.0">
                  {geoms}
                  <joint name="object{i}:joint" type="free"/>
                </body>
              </worldbody>
            </mujoco>
            """
            xml.append(MjcfXML.from_string(src))
        model = compile_xml(xml, dtype=self.dtype)
        # composed objects have up to K subgeoms each
        model = sim_lib.scale_contact_budgets(
            model, sp.max_num_objects,
            sp.max_num_objects * (self.constants.max_geoms_per_object - 1),
        )
        return model, sim_lib.RearrangeIndex.build(model, sp.max_num_objects)

    def __init__(self, constants=None, parameters=None, mesh_names=None,
                 dtype=jnp.float32):
        super().__init__(constants, parameters, mesh_names=mesh_names,
                         dtype=dtype)
        # all sub-geom ids per slot: (O, K)
        c = self.model.const
        gn = c.names["geom"]
        K = self.constants.max_geoms_per_object
        sub = []
        for i in range(self.max_num_objects):
            row = [gn[f"object{i}"]]
            row += [gn[f"object{i}:g{k}"] for k in range(1, K)]
            sub.append(row)
        self._sub_geom_ids = np.asarray(sub, np.int32)         # (O, K)
        self._sub_mesh_ids = np.asarray(
            [[c.geom_dataid[g] for g in row] for row in sub], np.int32
        )
        # a tiny placeholder hull appended to the bank for inactive sub-geoms
        V = self.bank.hull_vert.shape[1]
        tiny = np.zeros((1, V, 3), np.float32)
        tiny[0, :8] = (
            np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                      for sz in (-1, 1)]) * 1e-3
        )
        tmask = np.zeros((1, V), np.float32)
        tmask[0, :8] = 1.0
        self._tiny_idx = self.bank.num_candidates
        self.bank = dataclasses.replace(
            self.bank,
            names=self.bank.names + ("tiny",),
            hull_vert=jnp.concatenate(
                [self.bank.hull_vert, jnp.asarray(tiny, self.dtype)]
            ),
            hull_mask=jnp.concatenate(
                [self.bank.hull_mask, jnp.asarray(tmask, self.dtype)]
            ),
            mass=jnp.concatenate(
                [self.bank.mass, jnp.asarray([1e-6], self.dtype)]
            ),
            inertia=jnp.concatenate(
                [self.bank.inertia,
                 jnp.asarray([[1e-10, 1e-10, 1e-10]], self.dtype)]
            ),
            iquat=jnp.concatenate(
                [self.bank.iquat, jnp.asarray([[1, 0, 0, 0]], self.dtype)]
            ),
            bbox_half=jnp.concatenate(
                [self.bank.bbox_half,
                 jnp.asarray([[1e-3, 1e-3, 1e-3]], self.dtype)]
            ),
        )

    def _reset_model_fields(self, key: jax.Array):
        cst = self.constants
        O = self.max_num_objects
        K = cst.max_geoms_per_object
        k_cand, k_num, k_off, k_groups = jax.random.split(key, 4)
        ncand = self._tiny_idx
        cand = jax.random.randint(k_cand, (O, K), 0, ncand)
        # per-object number of active sub-geoms in [1, K]
        num_geoms = jax.random.randint(k_num, (O,), 1, K + 1)
        active_sub = jnp.arange(K)[None, :] < num_geoms[:, None]   # (O, K)
        cand = jnp.where(active_sub, cand, self._tiny_idx)
        # attachment offsets; root sub-geom at the body origin
        radius = cst.attachment_radius * cst.normalized_mesh_size
        offs = jax.random.uniform(k_off, (O, K, 3), self.dtype,
                                  -radius, radius)
        offs = offs.at[:, 0].set(0.0)
        offs = jnp.where(active_sub[:, :, None], offs, 0.0)

        mids = jnp.asarray(self._sub_mesh_ids).reshape(-1)
        gids = jnp.asarray(self._sub_geom_ids).reshape(-1)
        bids = jnp.asarray(self.idx.object_body_ids)
        cflat = cand.reshape(-1)

        # composed mass + parallel-axis inertia about the body origin
        sub_m = self.bank.mass[cand]                                # (O, K)
        mass = sub_m.sum(-1)
        eye = jnp.eye(3, dtype=self.dtype)
        r2 = jnp.sum(offs ** 2, -1)                                 # (O, K)
        # treat sub-hulls' own inertia as diagonal in the body frame
        I_own = jnp.zeros((O, K, 3, 3), self.dtype) + (
            self.bank.inertia[cand][..., None] * eye
        )
        I_par = sub_m[..., None, None] * (
            r2[..., None, None] * eye
            - offs[..., :, None] * offs[..., None, :]
        )
        I_tot = (I_own + I_par).sum(axis=1)                         # (O,3,3)
        inertia_diag = jnp.maximum(
            jnp.stack([I_tot[:, 0, 0], I_tot[:, 1, 1], I_tot[:, 2, 2]], -1),
            1e-10,
        )
        # composed bounding half-extent per object
        span = jnp.max(
            jnp.abs(offs) + self.bank.bbox_half[cand], axis=1
        )                                                           # (O, 3)
        if cst.use_grey_colors:
            colors = jnp.tile(
                jnp.asarray([0.5, 0.5, 0.5, 1.0], self.dtype), (O, 1)
            )
            group_ids = jnp.arange(O)
        else:
            group_ids, colors = self._sample_object_groups(k_groups)
        all_sub_colors = jnp.repeat(colors, K, axis=0)

        fields = {
            "mesh_convex_vert": self.model.mesh_convex_vert.at[mids].set(
                self.bank.hull_vert[cflat]
            ),
            "mesh_convex_mask": self.model.mesh_convex_mask.at[mids].set(
                self.bank.hull_mask[cflat]
            ),
            "geom_pos": self.model.geom_pos.at[gids].set(
                offs.reshape(-1, 3)
            ),
            "body_mass": self.model.body_mass.at[bids].set(mass),
            "body_inertia": self.model.body_inertia.at[bids].set(inertia_diag),
            "body_ipos": self.model.body_ipos.at[bids].set(
                jnp.zeros((O, 3), self.dtype)
            ),
            "geom_size": self.model.geom_size.at[
                jnp.asarray(self.idx.object_geom_ids)
            ].set(span),
            "geom_rgba": self.model.geom_rgba.at[gids].set(all_sub_colors),
        }
        return fields, span, group_ids


def make_env(constants=None, parameters=None, mesh_names=None,
             dtype=jnp.float32):
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    cst = ComposerEnvConstants(**cst_kw)
    par_kw = dict(parameters or {})
    mesh_names = par_kw.pop("mesh_names", mesh_names)
    sp = blocks_lib.RearrangeSimParameters(**par_kw.pop("simulation_params", {}))
    rcp_kw = par_kw.pop("robot_control_params", None)
    rcp = (
        composite_lib.RobotControlParameters(**rcp_kw)
        if rcp_kw is not None else composite_lib.RobotControlParameters()
    )
    par = blocks_lib.RearrangeEnvParameters(
        simulation_params=sp, robot_control_params=rcp, **par_kw
    )
    return ComposerRearrangeEnv(cst, par, mesh_names=mesh_names, dtype=dtype)
