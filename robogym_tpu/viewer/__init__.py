from robogym_tpu.viewer.replay import EnvReplayViewer, render_trajectory  # noqa: F401
