from quadruped_tpu.control import desired_state, mpc, swing, stance_force_balance  # noqa: F401
