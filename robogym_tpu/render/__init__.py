"""On-device raycast renderer (vision observations / goal images).

The reference renders camera observations through MuJoCo's OpenGL offscreen
renderer (robogym/envs/rearrange/observation/common.py:12-95,
robogym/observation/goal.py:46-82). A GL renderer is host-side and
unbatchable; here rendering is a jit/vmap-able JAX function over the same
Model/Data pytrees the physics uses, so image observations are produced on
the TPU for the whole env batch with no host round-trip.
"""

from robogym_tpu.render.raycast import (  # noqa: F401
    camera_id,
    camera_pose,
    render_camera,
    render_rgb,
    render_uint8,
)
