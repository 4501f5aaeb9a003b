from quadruped_tpu.utils import viz, logging  # noqa: F401
