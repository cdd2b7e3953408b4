"""YCB mesh rearrange env module (reference envs/rearrange/ycb.py:1-93).
The implementation lives in mesh.py (YcbRearrangeEnv); this module mirrors
the reference layout so `load_env("ycb")` resolves."""

from robogym_tpu.envs.rearrange.mesh import (  # noqa: F401
    YcbRearrangeEnv,
    make_env,
)
