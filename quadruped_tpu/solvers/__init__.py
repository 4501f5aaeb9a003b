from quadruped_tpu.solvers import qp, condense  # noqa: F401
