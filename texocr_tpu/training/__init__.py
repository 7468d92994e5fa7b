"""Training: losses, jitted pjit train step, epoch loop."""
