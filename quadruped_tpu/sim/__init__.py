from quadruped_tpu.sim import srb_sim  # noqa: F401
