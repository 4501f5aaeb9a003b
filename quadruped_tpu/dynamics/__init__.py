from quadruped_tpu.dynamics import srb  # noqa: F401
