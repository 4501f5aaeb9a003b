from quadruped_tpu.estimation import velocity, pose, ground, contact, container  # noqa: F401
