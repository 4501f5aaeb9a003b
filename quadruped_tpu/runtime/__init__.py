from quadruped_tpu.runtime.bridge import (  # noqa: F401
    RobotBridge,
    LoopTimer,
    build_native,
    native_available,
)
