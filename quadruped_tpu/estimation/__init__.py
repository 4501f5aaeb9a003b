from quadruped_tpu.estimation import velocity, pose, ground, contact, container, cmu_kf, zmp  # noqa: F401
