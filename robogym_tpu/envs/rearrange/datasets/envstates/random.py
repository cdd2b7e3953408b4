"""Random envstate dataset (reference
envs/rearrange/datasets/envstates/random.py): samples environment states by
drawing object meshes from its object datasets with configured
probabilities. In the TPU build an envstate dataset evaluates to a static
candidate pool (bank-row indices) + per-object-dataset sampling weights;
the mixture env does the per-reset draw in-jit."""

from __future__ import annotations

import dataclasses
from typing import Dict, List


@dataclasses.dataclass(frozen=True)
class RandomEnvstateDataset:
    name: str
    # object-dataset name -> probability of drawing each object from it
    object_sample_prob: Dict[str, float]

    def candidate_weights(
        self, object_datasets, bank_names: List[str]
    ) -> List[float]:
        """Per-bank-candidate sampling weight under this dataset."""
        name_to_ds = {}
        for ds_name, prob in self.object_sample_prob.items():
            ds = object_datasets[ds_name]
            for obj in ds.object_names:
                name_to_ds[f"{ds.mesh_dirname}/{obj}"] = (
                    name_to_ds.get(f"{ds.mesh_dirname}/{obj}", 0.0)
                    + prob / max(len(ds.object_names), 1)
                )
        return [name_to_ds.get(n, 0.0) for n in bank_names]


def create(object_sample_prob: Dict[str, float],
           name: str = "") -> RandomEnvstateDataset:
    return RandomEnvstateDataset(
        name=name or "+".join(sorted(object_sample_prob)),
        object_sample_prob=dict(object_sample_prob),
    )
