"""Training engines: jitted train steps, LR schedules, evaluation loops."""
