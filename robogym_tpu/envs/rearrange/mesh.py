"""Mesh-object rearrange tier: MeshRearrangeEnv + the YCB env (TPU build).

Re-implements the reference mesh envs
(/root/reference/robogym/envs/rearrange/common/mesh.py:21-180,
simulation/mesh.py, ycb.py:1-93) TPU-first. The reference resamples mesh
files per reset and RECOMPILES the MjSim (_recreate_sim); compilation is
trace-once here, so mesh identity becomes per-episode DATA:

  * the world is compiled ONCE with `max_num_objects` mesh-geom slots, each
    owning a unique mesh asset id;
  * a host-side `MeshObjectBank` precomputes, for every candidate object
    (e.g. each YCB model dir), the padded convex hull (MAXV verts — the
    same budget the compiler pads to), mass/inertia/com at unit density,
    and bbox half-extents — all scale-normalized like the reference
    (`normalized_mesh_size`, common/mesh.py:67-104);
  * at reset, a candidate index is sampled per slot and the bank rows are
    written into the episode's `model_fields` overrides
    (`mesh_convex_vert`, `body_mass`, `body_inertia`, `body_ipos`,
    `body_iquat`, `geom_size`) — collision, dynamics, and placement all
    read the traced Model, so the swap needs no recompilation.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robogym_tpu.envs import core
from robogym_tpu.envs.rearrange import blocks as blocks_lib
from robogym_tpu.envs.rearrange import simulation as sim_lib
from robogym_tpu.mjcf import mesh as mesh_lib
from robogym_tpu.mjcf.xml_tools import ASSETS_DIR, MjcfXML
from robogym_tpu.robot import composite as composite_lib


def find_meshes_by_dirname(root_mesh_dir: str) -> Dict[str, List[str]]:
    """{dir_name -> stl files} under assets/stls/<root_mesh_dir>
    (reference common/utils.py:997-1020)."""
    root_path = os.path.join(ASSETS_DIR, "stls", root_mesh_dir)
    out: Dict[str, List[str]] = {}
    for subdir in sorted(os.listdir(root_path)):
        curr = os.path.join(root_path, subdir)
        if curr.endswith(".stl"):
            out[os.path.splitext(subdir)[0]] = [curr]
        elif os.path.isdir(curr):
            stls = sorted(glob.glob(os.path.join(curr, "*.stl")))
            if stls:
                out[subdir] = stls
    return out


@dataclasses.dataclass(frozen=True)
class MeshObjectBank:
    """Padded per-candidate mesh tables (host-built, device-resident)."""

    names: Tuple[str, ...]
    hull_vert: jax.Array      # (C, MAXV, 3) zero-padded, com-centered frame
    hull_mask: jax.Array      # (C, MAXV)
    mass: jax.Array           # (C,) at density 1000 (reference block density)
    inertia: jax.Array        # (C, 3) principal body inertia
    iquat: jax.Array          # (C, 4) principal frame orientation
    bbox_half: jax.Array      # (C, 3) half extents (hull frame)

    @classmethod
    def build(
        cls,
        mesh_files_by_name: Dict[str, List[str]],
        max_verts: int = 64,
        normalized_mesh_size: float = 0.05,
        density: float = 1000.0,
        dtype=jnp.float32,
    ) -> "MeshObjectBank":
        from robogym_tpu.utils.rotation import _np_mat2quat

        names, hulls, masks, masses, inertias, iquats, bboxes = (
            [], [], [], [], [], [], []
        )
        for name, files in sorted(mesh_files_by_name.items()):
            all_v = []
            for f in files:
                v, tri = mesh_lib.load_stl(f)
                all_v.append(v)
            verts = np.concatenate(all_v, axis=0)
            hull = mesh_lib.convex_hull(verts, max_verts=max_verts)
            # normalize: max half-extent -> normalized_mesh_size
            # (common/mesh.py:75-88)
            half = (hull.max(0) - hull.min(0)) / 2.0
            scale = normalized_mesh_size / max(half.max(), 1e-9)
            hull = hull * scale
            # center at volume com; mass/inertia from the hull at `density`.
            # ConvexHull simplices are not consistently oriented — flip each
            # so its normal points away from the centroid (required by the
            # signed-tetra volume accumulation).
            from scipy.spatial import ConvexHull as _CH

            faces = _CH(hull).simplices.astype(np.int32)
            fa, fb, fc = hull[faces[:, 0]], hull[faces[:, 1]], hull[faces[:, 2]]
            nrm = np.cross(fb - fa, fc - fa)
            flip = np.einsum("ij,ij->i", nrm, fa - hull.mean(0)) < 0
            faces[flip] = faces[flip][:, [0, 2, 1]]
            vol, com, I = mesh_lib.mesh_volume_com_inertia(hull, faces)
            vol = abs(vol)
            hull = hull - com
            mass = max(vol, 1e-9) * density
            I = I * density
            w, v = np.linalg.eigh(I)
            if np.linalg.det(v) < 0:
                v[:, 0] *= -1
            iq = _np_mat2quat(v[:, ::-1].copy())
            nv = len(hull)
            pad = np.zeros((max_verts, 3))
            pad[:nv] = hull
            msk = np.zeros(max_verts)
            msk[:nv] = 1.0
            names.append(name)
            hulls.append(pad)
            masks.append(msk)
            masses.append(mass)
            inertias.append(np.maximum(w[::-1].copy(), 1e-10))
            iquats.append(iq)
            bboxes.append((hull.max(0) - hull.min(0)) / 2.0)
        return cls(
            names=tuple(names),
            hull_vert=jnp.asarray(np.stack(hulls), dtype),
            hull_mask=jnp.asarray(np.stack(masks), dtype),
            mass=jnp.asarray(np.asarray(masses), dtype),
            inertia=jnp.asarray(np.stack(inertias), dtype),
            iquat=jnp.asarray(np.stack(iquats), dtype),
            bbox_half=jnp.asarray(np.stack(bboxes), dtype),
        )

    @property
    def num_candidates(self) -> int:
        return len(self.names)


def make_mesh_object_xml(name: str, stl_path: str, scale: float) -> MjcfXML:
    """One mesh-object slot body (reference common/utils.py make_mesh_object
    analogue; one combined collision hull per object)."""
    rel = os.path.relpath(stl_path, os.path.join(ASSETS_DIR, "stls"))
    src = f"""
    <mujoco>
      <asset>
        <mesh name="{name}:mesh" file="{rel}" scale="{scale} {scale} {scale}"/>
      </asset>
      <worldbody>
        <body name="{name}" pos="0.0 0.0 0.0">
          <geom name="{name}" type="mesh" mesh="{name}:mesh"
                rgba="0.8 0.4 0.1 1.0" density="1000"/>
          <joint name="{name}:joint" type="free"/>
        </body>
      </worldbody>
    </mujoco>
    """
    return MjcfXML.from_string(src)


@dataclasses.dataclass(frozen=True)
class MeshRearrangeEnvConstants(blocks_lib.RearrangeEnvConstants):
    """(common/mesh.py:31-41)."""

    use_grey_colors: bool = False
    normalize_mesh: bool = True
    normalized_mesh_size: float = 0.05
    sample_with_replacement: bool = True   # (ycb.py:39-41)


class MeshRearrangeEnv(blocks_lib.BlocksRearrangeEnv):
    """Rearrange env over mesh objects with per-episode mesh selection as
    model-field data (see module docstring)."""

    MESH_ROOT_DIRNAME: str = "ycb"

    def __init__(
        self,
        constants: Optional[MeshRearrangeEnvConstants] = None,
        parameters: Optional[blocks_lib.RearrangeEnvParameters] = None,
        mesh_names: Optional[List[str]] = None,
        mesh_files_by_name: Optional[Dict[str, List[str]]] = None,
        dtype=jnp.float32,
    ):
        constants = constants or MeshRearrangeEnvConstants()
        if mesh_files_by_name is not None:
            all_files = dict(mesh_files_by_name)
        else:
            all_files = find_meshes_by_dirname(self.MESH_ROOT_DIRNAME)
        if mesh_names is not None:
            all_files = {k: v for k, v in all_files.items() if k in mesh_names}
        assert all_files, f"no meshes for {mesh_names}"
        self.bank = MeshObjectBank.build(
            all_files,
            normalized_mesh_size=constants.normalized_mesh_size,
            dtype=dtype,
        )
        self._mesh_files = all_files
        super().__init__(constants, parameters, dtype=dtype)
        # slot mesh/body/geom ids for the per-reset overrides
        c = self.model.const
        self._slot_mesh_ids = np.asarray(
            [c.geom_dataid[g] for g in self.idx.object_geom_ids], np.int32
        )
        assert (self._slot_mesh_ids >= 0).all(), "object slots must be meshes"

    # -- world build: mesh slots instead of blocks ----------------------
    def _compile_world(self, sp, rcp):
        from robogym_tpu.mjcf.compiler import compile_xml

        first = sorted(self._mesh_files)[0]
        xml = sim_lib.build_blocks_world_xml(
            0, robot_control_params=rcp,
            mujoco_timestep=self.constants.mujoco_timestep,
        )
        for i in range(sp.max_num_objects):
            xml.append(
                make_mesh_object_xml(
                    f"object{i}", self._mesh_files[first][0], 1.0
                )
            )
        model = compile_xml(xml, dtype=self.dtype)
        model = sim_lib.scale_contact_budgets(model, sp.max_num_objects)
        return model, sim_lib.RearrangeIndex.build(model, sp.max_num_objects)

    # -- per-episode mesh selection (the _recreate_sim analogue) --------
    def _reset_model_fields(self, key: jax.Array):
        O = self.max_num_objects
        k_cand, k_groups = jax.random.split(key)
        cand = jax.random.choice(
            k_cand, self.bank.num_candidates, (O,),
            replace=self.constants.sample_with_replacement,
        )
        if self.constants.use_grey_colors:   # (common/mesh.py:54-58)
            colors = jnp.tile(
                jnp.asarray([0.5, 0.5, 0.5, 1.0], self.dtype), (O, 1)
            )
            group_ids = jnp.arange(O)
        else:
            group_ids, colors = self._sample_object_groups(k_groups)
        mv = self.model.mesh_convex_vert
        mm = self.model.mesh_convex_mask
        mids = jnp.asarray(self._slot_mesh_ids)
        fields = {
            "mesh_convex_vert": mv.at[mids].set(self.bank.hull_vert[cand]),
            "mesh_convex_mask": mm.at[mids].set(self.bank.hull_mask[cand]),
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
            # bbox half-extents drive placement + broadphase sizing
            "geom_size": self.model.geom_size.at[
                jnp.asarray(self.idx.object_geom_ids)
            ].set(self.bank.bbox_half[cand]),
            "geom_rgba": self.model.geom_rgba.at[
                jnp.asarray(self.idx.object_geom_ids)
            ].set(colors),
        }
        sizes = self.bank.bbox_half[cand]
        return fields, sizes, group_ids


class YcbRearrangeEnv(MeshRearrangeEnv):
    """(ycb.py:43-91): mesh candidates are the YCB model directories."""

    MESH_ROOT_DIRNAME = "ycb"


def make_env(
    constants: Optional[dict] = None,
    parameters: Optional[dict] = None,
    mesh_names: Optional[List[str]] = None,
    dtype=jnp.float32,
) -> YcbRearrangeEnv:
    cst_kw = dict(constants or {})
    if isinstance(cst_kw.get("goal_args"), dict):
        cst_kw["goal_args"] = tuple(sorted(cst_kw["goal_args"].items()))
    cst = MeshRearrangeEnvConstants(**cst_kw)
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
    return YcbRearrangeEnv(cst, par, mesh_names=mesh_names, dtype=dtype)
