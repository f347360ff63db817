"""Training runtime: schedules, state, trainers."""
