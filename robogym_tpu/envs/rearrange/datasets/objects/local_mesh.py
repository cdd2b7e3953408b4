"""Local-mesh object dataset (reference
envs/rearrange/datasets/objects/local_mesh.py): a named pool of mesh objects
from an assets/stls subdirectory, consumed by envstate datasets and the
mixture env."""

from __future__ import annotations

import dataclasses
from typing import Dict, List


@dataclasses.dataclass(frozen=True)
class LocalMeshObjectDataset:
    name: str
    mesh_dirname: str
    mesh_files: Dict[str, List[str]]

    @property
    def object_names(self):
        return sorted(self.mesh_files)


def create(mesh_dirname: str, name: str = "") -> LocalMeshObjectDataset:
    """(local_mesh.py create): scan assets/stls/<mesh_dirname>."""
    from robogym_tpu.envs.rearrange.mesh import find_meshes_by_dirname

    return LocalMeshObjectDataset(
        name=name or mesh_dirname,
        mesh_dirname=mesh_dirname,
        mesh_files=find_meshes_by_dirname(mesh_dirname),
    )
