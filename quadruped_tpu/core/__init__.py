from quadruped_tpu.core import se3, filters, splines  # noqa: F401
